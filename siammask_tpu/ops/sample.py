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


def _axis_weights(coords: jax.Array, extent: int, dtype) -> jax.Array:
    """(M, extent) bilinear interpolation weights: w[u, j] = relu(1 - |c_u - j|).

    Each row has the gather path's two taps ((1-frac) at floor, frac at
    floor+1) and zeros elsewhere; rows whose coordinate falls outside
    [-1, extent] are all-zero (the border-correction term in the mm sampler
    supplies the border value, reproducing ``interp_axis``'s invalid-tap
    substitution exactly)."""
    j = jnp.arange(extent, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - j[None, :]))
    return w.astype(dtype)


def separable_bilinear_sample_mm(img: jax.Array, ys: jax.Array, xs: jax.Array,
                                 border: jax.Array,
                                 mm_dtype=jnp.bfloat16) -> jax.Array:
    """The same separable bilinear sample as ``separable_bilinear_sample``,
    lowered as two MXU contractions with on-the-fly interpolation-weight
    matrices instead of VPU/HBM-bound gathers.

    out = W_y @ img @ W_x^T + border * (1 - rowsum(W_y) x rowsum(W_x)), where
    W_y (M, H) / W_x (N, W) each carry the 2-tap bilinear weights per output
    line. Dense contraction does extent/2 x the MACs of a 2-tap gather, but
    they are bf16 MXU MACs (~1 GFLOP for a 255^2 crop of a 480x854 frame,
    ~5 us at MXU rate) instead of dynamic gathers + the layout copies XLA
    inserts around them (~27 us/frame measured at batch 1; gathers scale
    linearly with serving streams while the MXU amortizes).

    Precision: frame uint8 values are EXACT in bfloat16 (integers <= 256);
    the weights round to bf16 (8-bit mantissa) and both dots accumulate in
    f32, so output error vs the f32 gather path is <~0.7 intensity units —
    below the reference's own crop quantization (cv2.resize emits uint8,
    tools/test.py:98-108) and in the same class as the bf16 rounding the
    deployed model applies to the crop anyway. Integer-aligned crops
    (crop_sz == model_sz) are bit-exact (weights are exactly {0, 1}). The
    fp32 parity paths keep the gather sampler; this is a deployment-mode
    lowering like the s2d stem / shift convs (tracker.py latency clone).
    """
    h, w, _ = img.shape
    wy = _axis_weights(ys, h, mm_dtype)          # (M, H)
    wx = _axis_weights(xs, w, mm_dtype)          # (N, W)
    imgm = img.astype(mm_dtype)
    out = jnp.einsum("uh,hwc,vw->uvc", wy, imgm, wx,
                     preferred_element_type=jnp.float32)
    sy = jnp.sum(wy.astype(jnp.float32), axis=1)  # (M,)
    sx = jnp.sum(wx.astype(jnp.float32), axis=1)  # (N,)
    corr = 1.0 - sy[:, None] * sx[None, :]
    return out + corr[:, :, None] * border[None, None, :].astype(jnp.float32)


def _pack_phases(c00, c01, c10, c11):
    """(Hp, Wp, C) x 4 phase crops -> (Hp, Wp, 4C) in (sy, sx, c) channel
    order — the exact block-2 space-to-depth packing the s2d stem conv
    consumes (resnet.SpaceToDepthStem w4 re-blocking)."""
    return jnp.concatenate([c00, c01, c10, c11], axis=-1)


def _phase_coords(u: jax.Array):
    """Split a sample-coordinate vector into even/odd block-2 phases.

    The odd phase is padded with a far-out-of-range coordinate (all-zero
    interpolation weights -> border fill) when the length is odd: the packed
    consumer (the s2d stem's zero-extended 8x8 kernel) multiplies that
    row/column only by zero taps, so its value is don't-care
    (resnet.SpaceToDepthStem docstring)."""
    even = u[0::2]
    odd = u[1::2]
    if odd.shape[0] < even.shape[0]:
        odd = jnp.concatenate([odd, jnp.full((1,), -1e9, odd.dtype)])
    return even, odd


def sample_packed(frame, ys, xs, border, impl: str = "gather"):
    """Separable bilinear sample emitting the block-2 space-to-depth-PACKED
    layout (ceil(M/2), ceil(N/2), 4C) directly — the packing happens in the
    sampling indices, so no post-hoc pixel-block relayout exists for XLA to
    materialize (the relayout is what made the s2d stem lose at batch in
    round 4: packed crops re-open that lowering for batched serving)."""
    sample = (separable_bilinear_sample if impl == "gather"
              else separable_bilinear_sample_mm)
    ys_e, ys_o = _phase_coords(ys)
    xs_e, xs_o = _phase_coords(xs)
    return _pack_phases(sample(frame, ys_e, xs_e, border),
                        sample(frame, ys_e, xs_o, border),
                        sample(frame, ys_o, xs_e, border),
                        sample(frame, ys_o, xs_o, border))


def subwindow_crop(frame: jax.Array, pos_xy: jax.Array, crop_sz: jax.Array,
                   model_sz: int, avg_chans: jax.Array,
                   rows_first: bool = False, impl: str = "gather",
                   packed: bool = False) -> jax.Array:
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
    if packed:
        return sample_packed(frame, oy + u, ox + u, avg_chans, impl=impl)
    if impl == "mm":
        return separable_bilinear_sample_mm(frame, oy + u, ox + u, avg_chans)
    return separable_bilinear_sample(frame, oy + u, ox + u, avg_chans,
                                     rows_first=rows_first)


def warp_back_mask(mask: jax.Array, back_box: jax.Array, out_hw: tuple[int, int],
                   border_value: float = -1.0, impl: str = "gather") -> jax.Array:
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
    sample = (separable_bilinear_sample_mm if impl == "mm"
              else separable_bilinear_sample)
    return sample(img, ys, xs, border)[:, :, 0]
