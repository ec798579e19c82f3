"""Tracking-variant ResNet-50 backbone (stride-8, dilated layer3, pad-0 stem).

Reproduces the architecture of the reference `experiments/siammask_sharp/resnet.py`
(the published SiamMask backbone), re-expressed as flax/NHWC for TPU:

- 7x7 stride-2 stem with **padding 0** (resnet.py:154), then 3x3/2 maxpool pad 1.
- Bottleneck conv2 uses ``padding = 2 - stride`` and ``padding = dilation`` when
  dilated (resnet.py:66-72).
- layer2 stride 2: its first block and downsample use 3x3 stride-2 **pad-0** convs
  (resnet.py:194-206), shrinking 31->15 rather than halving.
- layer3 stride 1 dilation 2: the *first* block runs at dilation 1 with a 3x3 pad-1
  downsample, remaining blocks at dilation 2 (resnet.py:184-215 — note the
  ``dd = dilation // 2`` first-block quirk).
- layer4 is omitted (``layer4=False`` in `custom.py:31`).

Spatial flow: template 127 -> p0 61x61(64) -> p1 31x31(256) -> p2 15x15(512)
-> p3 15x15(1024); search 255 -> 125 / 63 / 31 / 31.

Returns all four stages; the sharp Refine head consumes p0..p2 as skip features.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 1 - 0.1).
BN_KW = dict(epsilon=1e-5, momentum=0.9)


class SpaceToDepthStem(nn.Module):
    """The 7x7/stride-2 VALID stem conv, lowered as block-2 space-to-depth +
    4x4/stride-1 conv over 12 channels.

    A direct 7x7 conv over C_in=3 contracts only 3 of the MXU's 128 reduction
    lanes per tap — profiled at 78.5us + a 26.3us input layout copy per 255^2
    search frame (3.7 TFLOP/s, ~20% of the whole tracking step). Re-blocking
    pixels 2x2 into channels turns the same linear map into a 4x4 conv with a
    12-deep contraction: output (a_y, a_x) sums x[2a_y+ky, 2a_x+kx] * k[ky, kx]
    for ky,kx in 0..6 either way — the kernel is zero-padded to 8x8 so the
    extra (ky==7 or kx==7) taps contribute nothing, which also makes the
    odd-size zero row/col pad (255 -> 256) exact: padded pixels are only ever
    multiplied by those zero taps.

    The parameter stays ``kernel (7, 7, 3, features)`` — checkpoints, the
    torch .pth importer, and init statistics are unchanged vs nn.Conv.

    A 12-channel input is accepted as ALREADY packed (channel order (sy, sx,
    c) from `ops/sample.py sample_packed` — the crop emits the packed layout
    straight out of its sampling indices, so the phase-split movement below
    disappears entirely; this is what makes the s2d lowering viable on the
    batched serving path where the split's data movement scaled with batch).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features))
        x, kernel = promote_dtype(x, kernel, dtype=self.dtype)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w4 = k8.reshape(4, 2, 4, 2, 3, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)

        b, h, w, c = x.shape
        if c == 12:          # pre-packed crop (ops/sample.py sample_packed)
            xs = x
        else:
            hp, wp = -h % 2, -w % 2
            if hp or wp:
                x = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))
            h2, w2 = (h + hp) // 2, (w + wp) // 2
            # Row-phase split instead of a 6-D reshape+transpose: the
            # transpose relayouts 2x2 pixel blocks across the tiled layout
            # (profiled at 110us per 255^2 frame — more than the conv it
            # feeds); two row-strided slices + a minor-dim (W, C) -> (W/2, 2C)
            # merge + channel concat express the same permutation with
            # row-major-contiguous moves XLA fuses. Channel order is
            # (sy, sx, c), matching w4 above.
            x_even = x[:, 0::2].reshape(b, h2, w2, 2 * c)
            x_odd = x[:, 1::2].reshape(b, h2, w2, 2 * c)
            xs = jnp.concatenate([x_even, x_odd], axis=-1)
        return jax.lax.conv_general_dilated(
            xs, w4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def maxpool_3x3s2_p1_slices(x: jax.Array) -> jax.Array:
    """3x3/stride-2/pad-1 max pool as an elementwise max of 9 strided slices.

    Same result as nn.max_pool (pad with -inf, max over the window), but
    lowered as slices + maximum, which XLA fuses into one loop fusion instead
    of a reduce-window op (profiled at 92 GB/s effective — far under HBM —
    on the stem's 125^2 x 64 map).
    """
    b, h, w, c = x.shape
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    h_out = (h + 2 - 3) // 2 + 1
    w_out = (w + 2 - 3) // 2 + 1
    out = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + 2 * (h_out - 1) + 1, dx + 2 * (w_out - 1) + 1, c),
                (1, 2, 2, 1))
            out = part if out is None else jnp.maximum(out, part)
    return out


def maxpool_3x3s2_p1_phase(x: jax.Array) -> jax.Array:
    """3x3/stride-2/pad-1 max pool via even/odd phase splitting.

    Same result as nn.max_pool, but lowered with the s2d-stem trick (see
    SpaceToDepthStem): stride-2 access along W becomes a contiguous
    (W, C) -> (W/2, 2C) minor-dim merge and along H two row-phase strided
    slices — all fusable moves — followed by plain elementwise maximums.
    out[i] = max(xp[2i], xp[2i+1], xp[2i+2]) where xp is the pad-1 input, so
    each axis needs the pair-max of phases plus the even phase shifted by one:
    max3[i] = max(even[i], odd[i], even[i+1]).

    The reduce-window lowering profiled at 27.6 us/frame on the stem's
    125^2 x 64 map (91 GB/s effective — window shuffles on the VPU, far under
    HBM); 2-D strided slices materialize ~37 us copies EACH (the round-2
    attempt). This lowering keeps every move contiguous in the tiled layout.
    """
    b, h, w, c = x.shape
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    h_out = (h + 2 - 3) // 2 + 1
    w_out = (w + 2 - 3) // 2 + 1
    # --- W axis: pad 1 left, extend right to 2*(w_out+1) for the pair merge
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 2 * (w_out + 1) - w - 1), (0, 0)),
                 constant_values=neg)
    xs = xp.reshape(b, h, w_out + 1, 2 * c)  # [..., :c] even, [..., c:] odd
    wmax = jnp.maximum(jnp.maximum(xs[:, :, :w_out, :c], xs[:, :, :w_out, c:]),
                       xs[:, :, 1:, :c])
    # --- H axis: same via row-phase strided slices
    yp = jnp.pad(wmax, ((0, 0), (1, 2 * (h_out + 1) - h - 1), (0, 0), (0, 0)),
                 constant_values=neg)
    even, odd = yp[:, 0::2], yp[:, 1::2]  # (b, h_out + 1, w_out, c) each
    return jnp.maximum(jnp.maximum(even[:, :h_out], odd[:, :h_out]),
                       even[:, 1:])


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1 bottleneck with optional downsample."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: str | None = None  # None | 'conv1x1' | 'conv3x3'
    # for the 3x3 downsample these mirror the reference's dd/padding, which derive
    # from the STAGE dilation (resnet.py:195-200), not this block's dilation
    downsample_dilation: int = 1
    downsample_pad: int = 0
    dtype: Any = jnp.float32
    # cross-replica BN-stat sync axis (sync-BN inside shard_map); None = local
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = 2 - self.stride
        if self.dilation > 1:
            padding = self.dilation

        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn1", **BN_KW)(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(padding, padding)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn2", **BN_KW)(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn3", **BN_KW)(out)

        if self.downsample == "conv1x1":
            residual = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                                    name="downsample_bn", **BN_KW)(residual)
        elif self.downsample == "conv3x3":
            residual = nn.Conv(self.planes * 4, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=[(self.downsample_pad, self.downsample_pad)] * 2,
                               kernel_dilation=(self.downsample_dilation,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                                    name="downsample_bn", **BN_KW)(residual)

        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    """A stack of bottlenecks mirroring `_make_layer` (resnet.py:184-215)."""
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # First block: stride==1 and dilation==1 -> 1x1 downsample, else 3x3 with
        # dd = dilation // 2 (pad dd) when dilated, dd = 1 (pad 0) when strided.
        if self.stride == 1 and self.dilation == 1:
            downsample = "conv1x1"
            dd, ds_pad = 1, 0
        else:
            downsample = "conv3x3"
            if self.dilation > 1:
                dd = self.dilation // 2
                ds_pad = dd
            else:
                dd = 1
                ds_pad = 0

        # The first block runs at dilation dd (resnet.py:210 passes dd, not dilation).
        x = Bottleneck(self.planes, stride=self.stride, dilation=dd,
                       downsample=downsample, downsample_dilation=dd,
                       downsample_pad=ds_pad, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dilation=self.dilation, dtype=self.dtype,
                           bn_axis=self.bn_axis, name=f"block{i}")(x, train)
        return x


class ResNet50Tracking(nn.Module):
    """ResNet-50 layers 1-3 tracking backbone. Input NHWC float32 (0..255 BGR,
    matching the reference's raw-pixel convention — no normalization).

    Progressive unfreezing (`models/features.py:36-79`, `custom.py:37-41`): the
    stem and layer1 are NEVER trained (their BN always runs in eval); layer2 and
    layer3 switch to train-mode BN only once unfrozen at 50% training progress.
    ``train_layer2``/``train_layer3`` carry those per-stage flags.

    ``width`` is the stem/base plane count (64 = the real ResNet-50). Reduced
    widths keep the exact module tree, spatial flow, and stage structure while
    shrinking every channel dim proportionally — used by the multi-chip dryrun
    to validate the full dp/collective program shape within a compile budget."""
    dtype: Any = jnp.float32
    bn_axis: str | None = None
    width: int = 64
    # lower the stem via space-to-depth (see SpaceToDepthStem); False keeps the
    # direct 7x7 nn.Conv (same params either way — this is a lowering choice).
    # s2d wins decisively at batch 1 (-70us/frame, the tracker's latency
    # clone turns it on); at batch 64 training it measured ~1% slower (the
    # phase-split data movement scales with batch while the MXU amortizes the
    # C_in=3 waste), so throughput paths keep the direct conv.
    stem_s2d: bool = False
    # lower the stem max pool as 9 strided slices + max instead of
    # reduce-window (see maxpool_3x3s2_p1_slices). Measured on chip: the 9
    # 2-D strided slices cost ~37us EACH (unfused) vs 27us for the whole
    # reduce-window — keep reduce-window; the flag records the experiment
    maxpool_slices: bool = False
    # phase-split maxpool lowering (maxpool_3x3s2_p1_phase): contiguous
    # moves + elementwise max; the tracker's latency clone turns it on
    maxpool_phase: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, train_layer2: bool = False,
                 train_layer3: bool = False):
        del train  # the stem/layer1 are permanently frozen (BN eval)
        w = self.width
        if self.stem_s2d:
            x = SpaceToDepthStem(w, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(w, (7, 7), strides=(2, 2), padding="VALID",
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1", **BN_KW)(x)
        p0 = nn.relu(x)

        if self.maxpool_phase:
            x = maxpool_3x3s2_p1_phase(p0)
        elif self.maxpool_slices:
            x = maxpool_3x3s2_p1_slices(p0)
        else:
            x = nn.max_pool(p0, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
        p1 = ResNetStage(w, 3, dtype=self.dtype, bn_axis=self.bn_axis,
                         name="layer1")(x, False)
        p2 = ResNetStage(2 * w, 4, stride=2, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="layer2")(p1, train_layer2)
        p3 = ResNetStage(4 * w, 6, stride=1, dilation=2, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="layer3")(p2, train_layer3)
        return p0, p1, p2, p3
