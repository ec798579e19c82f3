"""Parity tests for core ops against torch functional oracles and cv2."""
import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from siammask_tpu.ops.resize import upsample_bilinear_align_corners, upsample_nearest
from siammask_tpu.ops.sample import subwindow_crop, warp_back_mask
from siammask_tpu.ops.unfold import unfold, unfold_windows
from siammask_tpu.ops.xcorr import (depthwise_xcorr_conv, depthwise_xcorr_mm,
                                    depthwise_xcorr_shift)

RNG = np.random.RandomState(42)


def test_bilinear_align_corners_matches_torch():
    x = RNG.randn(2, 63, 63, 3).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), (127, 127)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.interpolate(xt, size=(127, 127), mode="bilinear", align_corners=True)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_nearest_matches_torch():
    for in_sz, out_sz in [(15, 31), (31, 61), (61, 127), (16, 8)]:
        x = RNG.randn(1, in_sz, in_sz, 4).astype(np.float32)
        ours = np.asarray(upsample_nearest(jnp.asarray(x), (out_sz, out_sz)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = F.interpolate(xt, size=(out_sz, out_sz), mode="nearest")
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_unfold_matches_torch():
    x = RNG.randn(2, 3, 32, 32).astype(np.float32)
    for kernel, pad, stride in [((5, 5), 0, 1), ((7, 7), 3, 2), ((15, 15), 0, 4)]:
        ours = np.asarray(unfold(jnp.asarray(x), kernel, padding=pad, stride=stride))
        theirs = F.unfold(torch.from_numpy(x), kernel, padding=pad, stride=stride).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_unfold_windows_layout():
    x = RNG.randn(1, 10, 10, 2).astype(np.float32)
    win = np.asarray(unfold_windows(jnp.asarray(x), (3, 3), padding=0, stride=1))
    assert win.shape == (1, 64, 3, 3, 2)
    # window (row 2, col 5) must equal the direct slice
    np.testing.assert_allclose(win[0, 2 * 8 + 5], x[0, 2:5, 5:8, :], atol=0)


def test_unfold_windows_matches_torch_unfold():
    """The gather lowering must reproduce F.unfold exactly — incl. padded
    windows (zero taps) and strided grids (the Refine skip-window geometry)."""
    x = RNG.randn(2, 21, 21, 3).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for kernel, pad, stride in [((5, 5), 0, 2), ((7, 7), 3, 2), ((9, 9), 4, 1),
                                ((13, 13), 0, 4)]:
        win = np.asarray(unfold_windows(jnp.asarray(x), kernel, padding=pad,
                                        stride=stride))
        ref = F.unfold(xt, kernel, padding=pad, stride=stride).numpy()
        n, l = win.shape[:2]
        # (N, L, kh, kw, C) -> F.unfold's (N, C*kh*kw, L)
        ours = win.transpose(0, 4, 2, 3, 1).reshape(n, -1, l)
        np.testing.assert_allclose(ours, ref, atol=0)


def test_unfold_windows_static_slice_matches_gather():
    """The few-window static-slice lowering (stage-2 refine geometry: 3x3
    grid) must agree bit-exactly with the generic gather lowering."""
    from siammask_tpu.ops import unfold as U
    x = RNG.randn(2, 69, 69, 4).astype(np.float32)
    for kernel, stride in [((61, 61), 4), ((15, 15), 27)]:
        fast = np.asarray(unfold_windows(jnp.asarray(x), kernel, stride=stride))
        oh = (69 - kernel[0]) // stride + 1
        assert fast.shape[1] == oh * oh <= 16  # static path taken
        # force the gather path by building windows from the raw formula
        ref = np.stack([x[:, i * stride:i * stride + kernel[0],
                          j * stride:j * stride + kernel[1], :]
                        for i in range(oh) for j in range(oh)], axis=1)
        np.testing.assert_array_equal(fast, ref)


def test_depthwise_xcorr_matches_torch():
    b, c = 2, 16
    x = RNG.randn(b, 29, 29, c).astype(np.float32)
    k = RNG.randn(b, 5, 5, c).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    kt = torch.from_numpy(k).permute(0, 3, 1, 2)
    # oracle: grouped conv with groups=b*c (torch semantics of conv2d_dw_group)
    xm = xt.reshape(1, b * c, 29, 29)
    km = kt.reshape(b * c, 1, 5, 5)
    ref = F.conv2d(xm, km, groups=b * c).reshape(b, c, 25, 25)
    ref = ref.permute(0, 2, 3, 1).numpy()

    for fn in (depthwise_xcorr_conv, depthwise_xcorr_mm, depthwise_xcorr_shift):
        ours = np.asarray(fn(jnp.asarray(x), jnp.asarray(k)))
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)

    # the shift lowering (latency path) is vmap-compatible and differentiable
    v = jax.vmap(depthwise_xcorr_shift)(jnp.asarray(x)[:, None],
                                        jnp.asarray(k)[:, None])
    np.testing.assert_allclose(np.asarray(v)[:, 0], ref, atol=1e-3, rtol=1e-4)
    g = jax.grad(lambda a, b_: jnp.sum(depthwise_xcorr_shift(a, b_) ** 2))(
        jnp.asarray(x), jnp.asarray(k))
    gm = jax.grad(lambda a, b_: jnp.sum(depthwise_xcorr_mm(a, b_) ** 2))(
        jnp.asarray(x), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gm), atol=2e-2,
                               rtol=1e-3)


def _ref_subwindow(im, pos, model_sz, original_sz, avg_chans):
    """Host oracle reproducing get_subwindow_tracking semantics on float images."""
    sz = original_sz
    c = (original_sz + 1) / 2
    context_xmin = round(pos[0] - c)
    context_xmax = context_xmin + sz - 1
    context_ymin = round(pos[1] - c)
    context_ymax = context_ymin + sz - 1
    r, cc, k = im.shape
    left = int(max(0., -context_xmin))
    top = int(max(0., -context_ymin))
    right = int(max(0., context_xmax - cc + 1))
    bottom = int(max(0., context_ymax - r + 1))
    context_xmin += left
    context_xmax += left
    context_ymin += top
    context_ymax += top
    te = np.zeros((r + top + bottom, cc + left + right, k), np.float32)
    te[top:top + r, left:left + cc] = im
    if top: te[:top] = avg_chans
    if bottom: te[r + top:] = avg_chans
    if left: te[:, :left] = avg_chans
    if right: te[:, cc + left:] = avg_chans
    patch = te[int(context_ymin):int(context_ymax + 1), int(context_xmin):int(context_xmax + 1)]
    if model_sz != original_sz:
        patch = cv2.resize(patch, (model_sz, model_sz))
    return patch


@pytest.mark.parametrize("pos,crop_sz,model_sz", [
    ((100.0, 120.0), 80, 127),      # fully inside
    ((10.0, 10.0), 90, 127),        # pads top-left
    ((310.0, 230.0), 200, 255),     # pads bottom-right
    ((160.0, 120.0), 127, 127),     # no-resize branch
    ((55.5, 77.25), 93, 127),       # fractional center
])
def test_subwindow_crop_matches_reference(pos, crop_sz, model_sz):
    im = RNG.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    avg = im.mean(axis=(0, 1))
    ref = _ref_subwindow(im, pos, model_sz, crop_sz, avg)
    ours = np.asarray(subwindow_crop(jnp.asarray(im), jnp.asarray(pos, dtype=jnp.float32),
                                     jnp.asarray(float(crop_sz)), model_sz,
                                     jnp.asarray(avg)))
    np.testing.assert_allclose(ours, ref, atol=1e-2)  # cv2 float32 accumulation noise


@pytest.mark.parametrize("pos,crop_sz,model_sz", [
    ((100.0, 120.0), 80, 127),      # fully inside
    ((10.0, 10.0), 90, 127),        # pads top-left
    ((55.5, 77.25), 93, 127),       # fractional center
])
def test_subwindow_crop_axis_order_and_uint8_commute(pos, crop_sz, model_sz):
    """The two separable gather orders compute the same 4-tap weighted sum,
    associated differently — they agree to f32 rounding (~1 ULP), not
    bit-for-bit. A uint8 frame cropped with the cast-after-gather lowering
    (ops/sample.py) IS bit-for-bit identical to cropping the frame pre-cast
    to f32 (gather only selects; cast commutes exactly). Both are
    latency-path knobs on the production tracker step."""
    im8 = RNG.randint(0, 256, size=(240, 320, 3)).astype(np.uint8)
    im32 = im8.astype(np.float32)
    avg = im32.mean(axis=(0, 1))
    args = (jnp.asarray(pos, dtype=jnp.float32), jnp.asarray(float(crop_sz)),
            model_sz, jnp.asarray(avg))
    cols = np.asarray(subwindow_crop(jnp.asarray(im32), *args))
    rows = np.asarray(subwindow_crop(jnp.asarray(im32), *args, rows_first=True))
    np.testing.assert_allclose(rows, cols, rtol=2e-6, atol=2e-4)
    u8 = np.asarray(subwindow_crop(jnp.asarray(im8), *args))
    assert u8.dtype == np.float32
    np.testing.assert_array_equal(u8, cols)
    u8r = np.asarray(subwindow_crop(jnp.asarray(im8), *args, rows_first=True))
    np.testing.assert_array_equal(u8r, rows)


@pytest.mark.parametrize("pos,crop_sz,model_sz", [
    ((100.0, 120.0), 80, 127),      # fully inside
    ((10.0, 10.0), 90, 127),        # pads top-left (border taps exercised)
    ((310.0, 230.0), 200, 255),     # pads bottom-right
    ((55.5, 77.25), 93, 127),       # fractional center
])
def test_subwindow_crop_mm_matches_gather(pos, crop_sz, model_sz):
    """The MXU-contraction sampler (impl='mm'): same bilinear weights as the
    gather path, lowered as two weight-matrix matmuls (bf16 inputs, f32
    accumulation). uint8 frame values are exact in bf16; only the fractional
    weights round (8-bit mantissa), bounding the error at ~2*255*2^-9 ≈ 1
    intensity unit — below the reference's own uint8 crop quantization
    (cv2.resize emits uint8, tools/test.py:98-108)."""
    im8 = RNG.randint(0, 256, size=(240, 320, 3)).astype(np.uint8)
    avg = im8.astype(np.float32).mean(axis=(0, 1))
    args = (jnp.asarray(pos, dtype=jnp.float32), jnp.asarray(float(crop_sz)),
            model_sz, jnp.asarray(avg))
    ref = np.asarray(subwindow_crop(jnp.asarray(im8), *args))
    mm = np.asarray(subwindow_crop(jnp.asarray(im8), *args, impl="mm"))
    assert mm.dtype == np.float32
    np.testing.assert_allclose(mm, ref, atol=1.5)
    assert np.mean(np.abs(mm - ref)) < 0.3


def test_subwindow_crop_mm_integer_aligned_is_exact():
    """crop_sz == model_sz degenerates to an integer-aligned crop: every
    interpolation weight is exactly 0 or 1 (exact in bf16), uint8 pixels are
    exact in bf16, and the dots accumulate in f32 — bit-identical to the
    gather path, including the mean-pad border."""
    im8 = RNG.randint(0, 256, size=(240, 320, 3)).astype(np.uint8)
    avg = im8.astype(np.float32).mean(axis=(0, 1))
    args = (jnp.asarray([20.0, 230.0], dtype=jnp.float32),  # pads two sides
            jnp.asarray(127.0), 127, jnp.asarray(avg))
    ref = np.asarray(subwindow_crop(jnp.asarray(im8), *args))
    mm = np.asarray(subwindow_crop(jnp.asarray(im8), *args, impl="mm"))
    np.testing.assert_array_equal(mm, ref)


def _s2d_pack_reference(crop):
    """Block-2 space-to-depth in the stem's (sy, sx, c) channel order, zero
    pad to even size (resnet.SpaceToDepthStem)."""
    h, w, c = crop.shape
    crop = np.pad(crop, ((0, -h % 2), (0, -w % 2), (0, 0)))
    h2, w2 = crop.shape[0] // 2, crop.shape[1] // 2
    ph = [crop[sy::2, sx::2] for sy in (0, 1) for sx in (0, 1)]
    return np.concatenate(ph, axis=-1)


@pytest.mark.parametrize("model_sz", [127, 255])
def test_subwindow_crop_packed_matches_s2d_of_unpacked(model_sz):
    """packed=True must emit exactly the s2d packing of the unpacked crop in
    the phase positions the stem conv reads. The odd-phase pad row/col is
    DON'T-CARE by construction (the zero-extended 8x8 stem kernel multiplies
    it only by zero taps — resnet.SpaceToDepthStem), so the comparison masks
    it out rather than pinning the fill value."""
    im8 = RNG.randint(0, 256, size=(240, 320, 3)).astype(np.uint8)
    avg = im8.astype(np.float32).mean(axis=(0, 1))
    args = (jnp.asarray([30.0, 100.0], dtype=jnp.float32),
            jnp.asarray(173.0), model_sz, jnp.asarray(avg))
    unpacked = np.asarray(subwindow_crop(jnp.asarray(im8), *args))
    ref = _s2d_pack_reference(unpacked)
    packed = np.asarray(subwindow_crop(jnp.asarray(im8), *args, packed=True))
    assert packed.shape == ref.shape == ((model_sz + 1) // 2,) * 2 + (12,)
    hv = model_sz // 2   # valid (non-pad) extent when model_sz is odd
    np.testing.assert_array_equal(packed[:hv, :hv], ref[:hv, :hv])
    # even phases (sy=0, sx=0 -> channels 0:3) have no pad anywhere
    np.testing.assert_array_equal(packed[..., 0:3], ref[..., 0:3])
    # mm impl packs the same way, to mm tolerance
    packed_mm = np.asarray(subwindow_crop(jnp.asarray(im8), *args,
                                          packed=True, impl="mm"))
    np.testing.assert_allclose(packed_mm[:hv, :hv], ref[:hv, :hv], atol=1.5)


def test_warp_back_mm_matches_gather():
    mask = RNG.uniform(-6, 6, size=(127, 127)).astype(np.float32)
    back_box = jnp.asarray([-50.3, -20.7, 288.0, 216.0], dtype=jnp.float32)
    ref = np.asarray(warp_back_mask(jnp.asarray(mask), back_box, (240, 320)))
    mm = np.asarray(warp_back_mask(jnp.asarray(mask), back_box, (240, 320),
                                   impl="mm"))
    # bf16 weight/value rounding on O(1)-magnitude logits
    np.testing.assert_allclose(mm, ref, atol=0.08)
    assert np.mean(np.abs(mm - ref)) < 0.01


def test_warp_back_matches_cv2():
    mask = RNG.uniform(-1, 1, size=(127, 127)).astype(np.float32)
    im_w, im_h = 320, 240
    back_box = [-50.3, -20.7, im_w * 0.9, im_h * 0.9]

    a = (im_w - 1) / back_box[2]
    b = (im_h - 1) / back_box[3]
    mapping = np.array([[a, 0, -a * back_box[0]], [0, b, -b * back_box[1]]], dtype=np.float64)
    ref = cv2.warpAffine(mask, mapping, (im_w, im_h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=-1.0)

    ours = np.asarray(warp_back_mask(jnp.asarray(mask), jnp.asarray(back_box, dtype=jnp.float32),
                                     (im_h, im_w)))
    # cv2 uses fixed-point bilinear (5-bit fractional) — tolerance accounts for it
    np.testing.assert_allclose(ours, ref, atol=1e-1)
    assert np.mean(np.abs(ours - ref)) < 2e-2


def test_depthwise_xcorr_pallas_matches_mm():
    from siammask_tpu.ops.xcorr_pallas import depthwise_xcorr_pallas
    x = jnp.asarray(RNG.randn(2, 29, 29, 256), jnp.float32)
    k = jnp.asarray(RNG.randn(2, 5, 5, 256), jnp.float32)
    ref = depthwise_xcorr_mm(x, k)
    out = depthwise_xcorr_pallas(x, k, interpret=True)  # interpret: CPU host
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_depthwise_xcorr_pallas_grads_match_mm():
    """The custom_vjp pallas wrapper must produce mm-formulation gradients."""
    from siammask_tpu.ops.xcorr_pallas import depthwise_xcorr_ad
    x = jnp.asarray(RNG.randn(1, 9, 9, 8), jnp.float32)
    k = jnp.asarray(RNG.randn(1, 3, 3, 8), jnp.float32)

    def loss_pl(x, k):
        return jnp.sum(depthwise_xcorr_ad(x, k) ** 2)

    def loss_mm(x, k):
        return jnp.sum(depthwise_xcorr_mm(x, k) ** 2)

    gx_p, gk_p = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    gx_m, gk_m = jax.grad(loss_mm, argnums=(0, 1))(x, k)
    # atol floors the comparison for near-zero gradient elements: the two
    # formulations differ only by fp32 accumulation order (measured <=2e-5
    # abs across seeds), but a pure-rtol check fails by input luck
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_m),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_m),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shift_threshold", [0, 10_000])
@pytest.mark.parametrize("ci,co", [(4, 1), (16, 4), (4, 4), (32, 16)])
def test_conv3x3_lowerings_match_nn_conv(ci, co, shift_threshold):
    """Both Conv3x3 lowerings (VPU shift-accumulate for thin channels, MXU conv
    for wide) must match flax nn.Conv bit-for-parameter: same param names and
    shapes, same output. shift_threshold=0 forces the MXU conv path,
    10_000 forces the shift path for every (ci, co) here — the lowering the
    production batch-1 tracker uses. Gradients must also agree (the shift
    path is used inside the Refine decoder during training)."""
    import flax.linen as nn

    from siammask_tpu.models.heads import Conv3x3

    mod = Conv3x3(co, shift_threshold=shift_threshold)
    x = jnp.asarray(RNG.randn(2, 13, 13, ci), jnp.float32)
    ref = nn.Conv(co, (3, 3), padding=[(1, 1), (1, 1)])
    variables = ref.init(jax.random.PRNGKey(1), x)
    got = mod.apply(variables, x)
    want = ref.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g_got = jax.grad(lambda v: jnp.sum(mod.apply(v, x) ** 2))(variables)
    g_want = jax.grad(lambda v: jnp.sum(ref.apply(v, x) ** 2))(variables)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-4),
        g_got, g_want)


@pytest.mark.parametrize("ci,co,h,w", [(4, 1, 13, 13), (16, 4, 12, 14),
                                       (64, 16, 15, 15), (4, 4, 9, 11)])
def test_conv3x3_packed_lowering_matches_nn_conv(ci, co, h, w):
    """The block-2 output-packed lowering (heads._conv3x3_packed) computes
    the same linear map as nn.Conv 3x3 pad-1 — the packed 2x2 kernel's
    structural zeros and the round-up row/col crop must be exact for odd AND
    even spatial extents, forward and backward (it runs inside the refine
    training step when packed_threshold is set)."""
    import flax.linen as nn

    from siammask_tpu.models.heads import Conv3x3

    mod = Conv3x3(co, packed_threshold=co)
    x = jnp.asarray(RNG.randn(2, h, w, ci), jnp.float32)
    ref = nn.Conv(co, (3, 3), padding=[(1, 1), (1, 1)])
    variables = ref.init(jax.random.PRNGKey(2), x)
    got = mod.apply(variables, x)
    want = ref.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g_got = jax.grad(lambda v: jnp.mean(mod.apply(v, x) ** 2))(variables)
    g_want = jax.grad(lambda v: jnp.mean(ref.apply(v, x) ** 2))(variables)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-4),
        g_got, g_want)


def test_bench_flop_walker_counts_exactly():
    """bench._flops_per_frame must count conv/dot FLOPs exactly (2*MACs),
    multiply scan bodies by trip count, and ignore patch-extraction convs —
    it is the MFU numerator, and XLA cost_analysis cannot be used on backends
    that lower convolutions to custom-calls."""
    import sys
    sys.path.insert(0, "/root/repo")
    import bench

    def fn(x, w, m):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(-1, y.shape[-1]) @ m          # dot_general
        patches = jax.lax.conv_general_dilated_patches(
            jnp.transpose(x, (0, 3, 1, 2)), (3, 3), (1, 1), "VALID")
        def body(c, _):
            return c @ m, ()
        c, _ = jax.lax.scan(body, y, None, length=5)
        return c, patches

    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 16))
    m = jnp.zeros((16, 16))
    jitted = jax.jit(fn)
    got = bench._flops_per_frame(jitted, (x, w, m), 1)
    conv = 2 * (2 * 8 * 8 * 16) * (3 * 3 * 4)
    dot = 2 * (2 * 8 * 8) * 16 * 16
    scan_dots = 5 * dot
    assert got == conv + dot + scan_dots  # patches conv contributes ZERO
