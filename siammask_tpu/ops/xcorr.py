"""Depthwise cross-correlation between template and search features.

This is the signature SiamMask op (`models/rpn.py:32-38` `conv2d_dw_group`): the
template feature map acts as a per-(batch, channel) filter bank slid over the search
feature map. PyTorch realizes it as a grouped conv with groups=B*C; on TPU we offer
two lowerings:

- ``depthwise_xcorr_conv``: `lax.conv_general_dilated` with
  ``feature_group_count=B*C`` — XLA's native depthwise conv path.
- ``depthwise_xcorr_mm``: im2col + batched ``dot_general`` contracting the template
  taps — reshapes the op into (B*C)-many (P x K) @ (K) matvecs that XLA tiles onto
  the MXU/VPU; this is the default since giant group counts can lower poorly.

Shapes (NHWC): search x (B, Hx, Wx, C), template kernel k (B, Hk, Wk, C)
-> (B, Hx-Hk+1, Wx-Wk+1, C). For SiamMask: (B,29,29,256) x (B,5,5,256) -> (B,25,25,256).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def depthwise_xcorr_conv(x: jax.Array, k: jax.Array) -> jax.Array:
    b, hx, wx, c = x.shape
    _, hk, wk, _ = k.shape
    # merge batch into channels: (1, Hx, Wx, B*C); kernel (Hk, Wk, 1, B*C)
    xm = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, hx, wx, b * c)
    km = jnp.transpose(k, (1, 2, 0, 3)).reshape(hk, wk, 1, b * c)
    out = lax.conv_general_dilated(
        xm, km, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    ho, wo = out.shape[1], out.shape[2]
    return jnp.transpose(out.reshape(ho, wo, b, c), (2, 0, 1, 3))


def depthwise_xcorr_mm(x: jax.Array, k: jax.Array) -> jax.Array:
    b, hx, wx, c = x.shape
    _, hk, wk, _ = k.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    # im2col: patches (B, Ho, Wo, C*Hk*Wk) with channel-major tap ordering
    patches = lax.conv_general_dilated_patches(
        jnp.transpose(x, (0, 3, 1, 2)),  # NCHW so taps order is (C, Hk, Wk)
        filter_shape=(hk, wk), window_strides=(1, 1), padding="VALID",
    )  # (B, C*Hk*Wk, Ho, Wo)
    patches = patches.reshape(b, c, hk * wk, ho * wo)
    kf = jnp.transpose(k.reshape(b, hk * wk, c), (0, 2, 1))  # (B, C, K)
    # contract taps: (B, C, K) x (B, C, K, P) -> (B, C, P)
    out = jnp.einsum("bck,bckp->bcp", kf, patches)
    return jnp.transpose(out.reshape(b, c, ho, wo), (0, 2, 3, 1))


def depthwise_xcorr_shift(x: jax.Array, k: jax.Array) -> jax.Array:
    """Shift-and-accumulate lowering: out = sum over the Hk*Wk taps of
    (shifted search slice) * (template tap), accumulated in fp32.

    Rationale (from a TPU profile of the tracking step): the im2col path
    materializes an un-reduced (B, C, Ho*Wo, Hk*Wk) product ~18x larger than
    the inputs — at batch 1 the op is pure HBM bandwidth, ~98us per head. Here
    every tap is an elementwise multiply of an overlapping slice, so XLA fuses
    all Hk*Wk taps into ONE loop fusion whose output tiles re-read the same
    VMEM-resident input region — HBM traffic drops to x + k + out (~1 MB).
    Latency-optimal at tracking batch sizes. At train batch 64 the round-2
    measurement also favored it (the im2col patches tensor is ~1 GB at the
    stage-1 layout), so the train bench defaults to shift too; the three
    fused heads still read ~3 ms/step in the stage-1 trace, so `--xcorr mm`
    stays a measured alternative, not a dead branch.
    """
    b, hx, wx, c = x.shape
    _, hk, wk, _ = k.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    xf = x.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    acc = None
    for dy in range(hk):
        for dx in range(wk):
            term = xf[:, dy:dy + ho, dx:dx + wo, :] * kf[:, dy:dy + 1, dx:dx + 1, :]
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def depthwise_xcorr(x: jax.Array, k: jax.Array, impl: str = "mm") -> jax.Array:
    if impl == "mm":
        return depthwise_xcorr_mm(x, k)
    if impl == "conv":
        return depthwise_xcorr_conv(x, k)
    if impl == "shift":
        return depthwise_xcorr_shift(x, k)
    if impl == "pallas":
        from siammask_tpu.ops.xcorr_pallas import depthwise_xcorr_ad
        return depthwise_xcorr_ad(x, k)
    raise ValueError(f"unknown xcorr impl {impl!r}")
