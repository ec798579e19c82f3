"""Patch extraction matching ``torch.nn.functional.unfold``.

Used by the mask loss (per-RPN-cell ground-truth windows, `models/siammask.py:168` /
`siammask_sharp.py:172`) and by Refine's train path (per-cell backbone skip windows,
`experiments/siammask_sharp/custom.py:137-142`).

F.unfold(input NCHW, (kh, kw), padding, stride) -> (N, C*kh*kw, L) with the feature
axis ordered channel-major (c, ki, kj) and L enumerating windows row-major. We lower
to `lax.conv_general_dilated_patches` on NCHW input, whose output feature axis has
exactly that (C, *filter) ordering.

For TPU we return NHWC-friendly (N, L, kh, kw, C) windows via ``unfold_windows`` —
the layout downstream mask losses and Refine actually want.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def unfold(x_nchw: jax.Array, kernel: tuple[int, int], padding: int = 0,
           stride: int = 1) -> jax.Array:
    """Exact F.unfold: (N, C, H, W) -> (N, C*kh*kw, L)."""
    n = x_nchw.shape[0]
    kh, kw = kernel
    patches = lax.conv_general_dilated_patches(
        x_nchw, filter_shape=(kh, kw), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )  # (N, C*kh*kw, oh, ow)
    return patches.reshape(n, patches.shape[1], -1)


def unfold_windows(x_nhwc: jax.Array, kernel: tuple[int, int], padding: int = 0,
                   stride: int = 1) -> jax.Array:
    """(N, H, W, C) -> (N, L, kh, kw, C) sliding windows (row-major L).

    Lowered as two static-index row/column gathers, NOT
    ``conv_general_dilated_patches``: XLA executes the patches op as a real
    convolution whose identity kernel spans the whole window — for the Refine
    skip windows (61x61 over 64 channels etc.) that is ~petaFLOPs of
    multiply-by-zero per training step, measured 6x the entire step time of
    the stage-2 refine layout. Gathers move exactly the window bytes.
    """
    n, h, w, c = x_nhwc.shape
    kh, kw = kernel
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (w + 2 * padding - kw) // stride + 1
    if padding == 0 and oh * ow <= 16:
        # Few-window case (Refine's 3x3 grid over the 143^2 stage-2 layout):
        # L static slices + one stack move exactly the window bytes once. The
        # gather lowering below was profiled at 17.2 ms/step of the 40.5
        # ms stage-2 refine step (fwd takes + (oh*kh,ow*kw) transpose, bwd
        # scatter-pad fusions over the doubly-materialized intermediate);
        # static slices need no index machinery and no relayout, and their
        # backward is slice-of-grad / pad — the cheapest scatter XLA has.
        wins = [x_nhwc[:, i * stride:i * stride + kh,
                       j * stride:j * stride + kw, :]
                for i in range(oh) for j in range(ow)]
        return jnp.stack(wins, axis=1)
    rows = (stride * jnp.arange(oh))[:, None] + jnp.arange(kh)[None, :] - padding
    cols = (stride * jnp.arange(ow))[:, None] + jnp.arange(kw)[None, :] - padding
    g = jnp.take(x_nhwc, jnp.clip(rows.reshape(-1), 0, h - 1), axis=1)
    g = jnp.take(g, jnp.clip(cols.reshape(-1), 0, w - 1), axis=2)
    if padding > 0:  # zero out the virtual-padding taps the clip folded in
        rv = ((rows >= 0) & (rows < h)).reshape(-1)
        cv = ((cols >= 0) & (cols < w)).reshape(-1)
        g = g * (rv[None, :, None, None] & cv[None, None, :, None]).astype(g.dtype)
    g = g.reshape(n, oh, kh, ow, kw, c)
    return jnp.transpose(g, (0, 1, 3, 2, 4, 5)).reshape(n, oh * ow, kh, kw, c)
