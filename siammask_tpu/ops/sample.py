"""Separable bilinear sampling with constant border — the on-device workhorse
behind both hot-path image ops:

- the search/template sub-window crop (replaces host cv2 pad+resize,
  `tools/test.py:67-110`): crop-at-integer-origin composed with cv2-style
  half-pixel bilinear resize collapses into one axis-aligned sampling grid;
- the mask warp-back to frame coordinates (replaces host cv2.warpAffine,
  `tools/test.py:263-282`): the affine map there is axis-aligned too.

Axis-aligned means ys depends only on the output row and xs only on the output
column, so the 2-D bilinear gather factorizes into two 1-D passes. Out-of-bounds
samples return the border value per channel, reproducing cv2 BORDER_CONSTANT and
the reference's mean-pad crop buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def separable_bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array,
                              border: jax.Array,
                              rows_first: bool = False) -> jax.Array:
    """Sample ``img`` (H, W, C) at the grid ys x xs -> (len(ys), len(xs), C).

    ys/xs are float sample coordinates (dynamic values, static length). ``border``
    is (C,) and substitutes any neighbor that falls outside the image, matching
    bilinear sampling of an infinitely border-padded image.

    ``rows_first`` picks which axis gathers first — the same 4-tap weighted
    sum either way, associated differently, so the orders agree to f32
    rounding (~1 ULP; pinned in tests/test_ops.py). It exists because XLA's
    chosen gather layouts differ and the better order depends on the
    producer's layout.
    """
    h, w, _ = img.shape
    # Integer images (uint8 frames) convert to f32 AFTER the first gather:
    # gather commutes with the cast bit-exactly, and casting the gathered
    # lines instead of the whole frame drops a full-frame f32 materialization
    # (~4.9 MB -> 0.4 MB on a 480x854 frame; profiled 4.7 us/frame of convert
    # traffic in the scan step). Float inputs keep their dtype through the
    # blend, unchanged.
    compute_dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) \
        else jnp.float32
    border = border.astype(compute_dtype)

    def interp_axis(src, coords, axis, extent):
        c0 = jnp.floor(coords)
        # frac stays in the coordinate dtype (f32): the blend promotes bf16
        # taps to f32 exactly as the pre-refactor two-pass code did
        frac = jnp.expand_dims((coords - c0)[:, None], 1 - axis)
        c0i = c0.astype(jnp.int32)

        def take(ci):
            valid = (ci >= 0) & (ci < extent)
            lines = jnp.take(src, jnp.clip(ci, 0, extent - 1), axis=axis)
            # Cast only raw integer inputs (uint8 frames). Floating inputs —
            # including the f32 intermediate the first pass produces from a
            # bf16 image (the blend promotes through the f32 frac) — keep
            # their precision, matching the pre-refactor two-pass code.
            if not jnp.issubdtype(lines.dtype, jnp.floating):
                lines = lines.astype(compute_dtype)
            valid = jnp.expand_dims(valid[:, None], 1 - axis)
            return jnp.where(valid, lines, border[None, None, :])

        return take(c0i) * (1.0 - frac) + take(c0i + 1) * frac

    if rows_first:
        tmp = interp_axis(img, ys, 0, h)      # (M, W, C)
        return interp_axis(tmp, xs, 1, w)     # (M, N, C)
    tmp = interp_axis(img, xs, 1, w)          # (H, N, C)
    return interp_axis(tmp, ys, 0, h)         # (M, N, C)


def subwindow_crop(frame: jax.Array, pos_xy: jax.Array, crop_sz: jax.Array,
                   model_sz: int, avg_chans: jax.Array,
                   rows_first: bool = False) -> jax.Array:
    """On-device equivalent of `get_subwindow_tracking` (tools/test.py:67-110).

    frame: (H, W, C) float; pos_xy: (2,) center (x, y); crop_sz: scalar side length
    (already rounded, may be traced); model_sz: static output side; avg_chans: (C,).

    The reference crops an integer-aligned square of side crop_sz whose origin is
    ``round(pos - (crop_sz + 1) / 2)`` (banker's rounding — jnp.round matches), then
    cv2-bilinear-resizes to model_sz. Composing the two, output pixel u samples
    frame coordinate ``origin + (u + 0.5) * crop_sz / model_sz - 0.5``; when
    crop_sz == model_sz this degenerates to the exact integer crop, matching the
    reference's resize-skip branch.
    """
    crop_sz = crop_sz.astype(jnp.float32)
    c = (crop_sz + 1.0) / 2.0
    ox = jnp.round(pos_xy[0] - c)
    oy = jnp.round(pos_xy[1] - c)
    u = (jnp.arange(model_sz, dtype=jnp.float32) + 0.5) * (crop_sz / model_sz) - 0.5
    # cv2.resize never reads outside the crop window — it edge-replicates — so clamp
    # the sample grid to the window before sampling the frame (out-of-frame samples
    # still resolve to avg_chans, reproducing the mean-padded crop buffer).
    u = jnp.clip(u, 0.0, crop_sz - 1.0)
    return separable_bilinear_sample(frame, oy + u, ox + u, avg_chans,
                                     rows_first=rows_first)


def warp_back_mask(mask: jax.Array, back_box: jax.Array, out_hw: tuple[int, int],
                   border_value: float = -1.0) -> jax.Array:
    """On-device equivalent of `crop_back` (tools/test.py:263-282).

    mask: (S, S) score-cell mask (e.g. 127x127 sigmoid logits); back_box: (4,)
    [bx, by, bw, bh] — the reference's affine places the mask so that image pixel
    (x, y) samples mask coordinate ``(x * bw_inv + bx0, ...)`` where the transform
    is dst = a*src + c with a=(out-1)/bw, c=-a*bx (note the historical out-1).
    Returns (out_h, out_w) with constant border (default -1, below any seg_thr).
    """
    out_w, out_h = out_hw[1], out_hw[0]
    bx, by, bw, bh = back_box[0], back_box[1], back_box[2], back_box[3]
    xs = jnp.arange(out_w, dtype=jnp.float32) * (bw / (out_w - 1)) + bx
    ys = jnp.arange(out_h, dtype=jnp.float32) * (bh / (out_h - 1)) + by
    img = mask[:, :, None]
    border = jnp.full((1,), border_value, dtype=img.dtype)
    return separable_bilinear_sample(img, ys, xs, border)[:, :, 0]
