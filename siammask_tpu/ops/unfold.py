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
    """(N, H, W, C) -> (N, L, kh, kw, C) sliding windows (row-major L)."""
    n, _, _, c = x_nhwc.shape
    kh, kw = kernel
    patches = lax.conv_general_dilated_patches(
        jnp.transpose(x_nhwc, (0, 3, 1, 2)),
        filter_shape=(kh, kw), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )  # (N, C*kh*kw, oh, ow)
    l = patches.shape[2] * patches.shape[3]
    patches = patches.reshape(n, c, kh, kw, l)
    return jnp.transpose(patches, (0, 4, 2, 3, 1))
