"""Pallas TPU kernel for depthwise cross-correlation.

The SiamMask xcorr contracts a 5x5 template window over a 29x29 search map
per channel — 25 taps, depthwise, no channel mixing. XLA lowers the grouped-conv
formulation through its generic conv path; this kernel instead keeps a channel
block resident in VMEM and accumulates the 25 shifted elementwise FMAs directly
on the VPU (the op is elementwise-per-channel, so the VPU, not the MXU, is its
natural home), one grid step per (batch, channel-block).

Shapes (NHWC): x (B, Hx, Wx, C), k (B, Hk, Wk, C) -> (B, Ho, Wo, C); tap count
Hk*Wk is unrolled at trace time (25 for SiamMask).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHANNEL_BLOCK = 128


def _xcorr_kernel(hk: int, wk: int, ho: int, wo: int):
    def kernel(x_ref, k_ref, o_ref):
        acc = jnp.zeros((ho, wo) + (o_ref.shape[-1],), dtype=jnp.float32)
        for dy in range(hk):
            for dx in range(wk):
                win = x_ref[0, dy:dy + ho, dx:dx + wo, :].astype(jnp.float32)
                tap = k_ref[0, dy, dx, :].astype(jnp.float32)
                acc = acc + win * tap[None, None, :]
        o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


@jax.custom_vjp
def depthwise_xcorr_ad(x: jax.Array, k: jax.Array) -> jax.Array:
    """Pallas forward with an XLA (im2col/dot_general) backward, so the kernel
    is usable under jax.grad in the training step."""
    interpret = jax.default_backend() != "tpu"
    return depthwise_xcorr_pallas(x, k, interpret=interpret)


def _ad_fwd(x, k):
    return depthwise_xcorr_ad(x, k), (x, k)


def _ad_bwd(res, g):
    from siammask_tpu.ops.xcorr import depthwise_xcorr_mm
    x, k = res
    _, vjp = jax.vjp(depthwise_xcorr_mm, x, k)
    return vjp(g)


depthwise_xcorr_ad.defvjp(_ad_fwd, _ad_bwd)


def depthwise_xcorr_pallas(x: jax.Array, k: jax.Array,
                           interpret: bool = False) -> jax.Array:
    b, hx, wx, c = x.shape
    _, hk, wk, _ = k.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    cb = min(CHANNEL_BLOCK, c)
    assert c % cb == 0, f"channels {c} not divisible by block {cb}"

    grid = (b, c // cb)
    return pl.pallas_call(
        _xcorr_kernel(hk, wk, ho, wo),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hx, wx, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hk, wk, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, k)
