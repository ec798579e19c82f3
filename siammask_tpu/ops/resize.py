"""Resize ops with exact PyTorch semantics, lowered as interpolation-matrix matmuls.

The reference mixes two upsampling flavors whose pixel grids differ:

- ``nn.UpsamplingBilinear2d`` == bilinear with align_corners=True (used by the mask
  loss 63->127 upsample, `models/siammask.py:167`).
- ``F.upsample(x, size)`` == *nearest* (default mode) — used inside Refine's decoder
  chain (`experiments/siammask_sharp/custom.py:150-152`).

`jax.image.resize` implements neither grid exactly, so we build explicit 1-D
interpolation matrices and apply them as two matmuls (separable). On TPU this is
MXU work instead of gathers, and the matrices are compile-time constants.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _bilinear_ac_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear weights with align_corners=True: src = i*(in-1)/(out-1)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) one-hot rows with torch-nearest mapping: src = floor(i*in/out)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        src = min(int(i * in_size / out_size), in_size - 1)
        m[i, src] = 1.0
    return m


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """x: (..., H, W, C); apply (H'->H) and (W'->W) interpolation matrices."""
    a = jnp.asarray(mh, dtype=x.dtype)
    b = jnp.asarray(mw, dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", a, x)
    return jnp.einsum("pw,...hwc->...hpc", b, x)


def upsample_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC (or HWC) bilinear resize, align_corners=True (torch UpsamplingBilinear2d)."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _bilinear_ac_matrix(h, out_hw[0]),
                            _bilinear_ac_matrix(w, out_hw[1]))


def upsample_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC (or HWC) nearest resize matching torch F.upsample/F.interpolate default."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _nearest_matrix(h, out_hw[0]),
                            _nearest_matrix(w, out_hw[1]))
