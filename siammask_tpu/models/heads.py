"""SiamMask heads: neck (ResDownS), DepthCorr RPN heads (UP), MaskCorr, Refine.

Flax/NHWC re-expressions of the reference experiment layer
(`experiments/siammask_sharp/custom.py`):

- ``ResDownS``: 1x1 conv 1024->256 + BN, center-cropping a 4px border when the map
  is smaller than 20px (template 15x15 -> 7x7; custom.py:12-25).
- ``DepthCorr``: 3x3 adjust conv+BN+ReLU on each side, depthwise cross-correlation
  (ops/xcorr.py), then 1x1 conv head (models/rpn.py:41-72).
- ``UP``: cls (2k ch) + loc (4k ch) DepthCorrs (custom.py:69-86).
- ``MaskCorr``: DepthCorr 256->256->o_sz^2 (custom.py:89-96).
- ``Refine``: U-shaped decoder fusing backbone skips p0/p1/p2 with the per-cell
  corr vector (custom.py:99-154). The reference's ConvTranspose2d(256,32,15,15)
  always sees 1x1 spatial input, so we lower it to a dense expand (a pure matmul on
  the MXU). Nearest upsampling matches torch F.upsample's default mode.

All modules are pure; BatchNorm uses running averages unless ``train=True``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from siammask_tpu.ops.resize import upsample_nearest
from siammask_tpu.ops.unfold import unfold_windows
from siammask_tpu.ops.xcorr import depthwise_xcorr

BN_KW = dict(epsilon=1e-5, momentum=0.9)


class ResDownS(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32
    # cross-replica BN-stat sync axis (sync-BN inside shard_map); None = local
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                         dtype=self.dtype, name="bn", **BN_KW)(x)
        if x.shape[2] < 20:
            x = x[:, 4:-4, 4:-4, :]
        return x


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                         dtype=self.dtype, name="bn", **BN_KW)(x)
        return nn.relu(x)


class DepthCorr(nn.Module):
    """Template/search adjust convs + depthwise xcorr + 1x1 head."""
    hidden: int
    out_channels: int
    kernel_size: int = 3
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    def setup(self):
        self.conv_kernel = ConvBNRelu(self.hidden, self.kernel_size, self.dtype,
                                      self.bn_axis, name="conv_kernel")
        self.conv_search = ConvBNRelu(self.hidden, self.kernel_size, self.dtype,
                                      self.bn_axis, name="conv_search")
        self.head_conv1 = ConvBNRelu(self.hidden, 1, self.dtype, self.bn_axis,
                                     name="head_conv1")
        self.head_conv2 = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="head_conv2")

    def forward_corr(self, kernel, search, train: bool = False):
        k = self.conv_kernel(kernel, train)
        s = self.conv_search(search, train)
        return depthwise_xcorr(s, k, impl=self.xcorr_impl)

    def head(self, feature, train: bool = False):
        return self.head_conv2(self.head_conv1(feature, train))

    def __call__(self, kernel, search, train: bool = False):
        return self.head(self.forward_corr(kernel, search, train), train)


class UP(nn.Module):
    """RPN heads: cls -> 2k channels, loc -> 4k channels."""
    anchor_num: int = 5
    feature_out: int = 256
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    def setup(self):
        self.cls = DepthCorr(self.feature_out, 2 * self.anchor_num,
                             xcorr_impl=self.xcorr_impl, dtype=self.dtype,
                             bn_axis=self.bn_axis, name="cls")
        self.loc = DepthCorr(self.feature_out, 4 * self.anchor_num,
                             xcorr_impl=self.xcorr_impl, dtype=self.dtype,
                             bn_axis=self.bn_axis, name="loc")

    def __call__(self, z_f, x_f, train: bool = False):
        return self.cls(z_f, x_f, train), self.loc(z_f, x_f, train)


class MaskCorr(nn.Module):
    """Mask head: each score-map cell predicts a flattened o_sz x o_sz mask."""
    o_sz: int = 63
    hidden: int = 256
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    def setup(self):
        self.mask = DepthCorr(self.hidden, self.o_sz ** 2,
                              xcorr_impl=self.xcorr_impl,
                              dtype=self.dtype, bn_axis=self.bn_axis,
                              name="mask")

    def __call__(self, z_f, x_f, train: bool = False):
        return self.mask(z_f, x_f, train)


class DeconvExpand(nn.Module):
    """ConvTranspose2d(in, out, k, stride=k) specialized to 1x1 spatial input:
    out[h, w, o] = sum_i x[i] * K[i, o, h, w] + b[o] — a dense expand.

    The kernel keeps torch's (in, out, kh, kw) layout so checkpoint conversion is a
    direct copy."""
    in_features: int = 256
    out_features: int = 32
    size: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, in_features) -> (B, size, size, out_features)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=0, out_axis=(1, 2, 3)),
            (self.in_features, self.out_features, self.size, self.size), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,),
                          self.dtype)
        out = jnp.einsum("bi,iohw->bhwo", x, kernel)
        return out + bias


def _conv3x3_packed(xd: jax.Array, k: jax.Array) -> jax.Array:
    """3x3 pad-1 conv lowered as block-2 space-to-depth on BOTH sides.

    The Refine decoder's tail convs have tiny output-channel counts
    (Co=16/4/1) at large spatial extents (31^2..127^2): as plain convs each
    output pixel row of the implied matmul fills only Co of the MXU's 128
    output lanes (3-13%). Re-blocking 2x2 pixels into channels — the
    output-side dual of ``resnet.SpaceToDepthStem`` — computes the same
    linear map as a 2x2 VALID conv from 4*Ci packed input channels to 4*Co
    packed output phases: 4x the output-lane fill for a 16/9 structural-zero
    FLOP overhead (each 2x2 output block's true receptive field is the full
    4x4 input patch the packed taps cover, but per phase only 9 of the 16
    pixels carry nonzero kernel).  Pack/unpack use the row-phase
    strided-slice + minor-dim merge moves XLA fuses (a naive 6-D
    reshape+transpose relayouts across the tile grid; see SpaceToDepthStem).

    Exact same map as ``lax.conv_general_dilated(pad=1)`` up to fp
    accumulation order (pinned in tests/test_ops.py).
    """
    b, h, w, ci = xd.shape
    co = k.shape[-1]
    h2, w2 = (h + 1) // 2, (w + 1) // 2        # output 2x2 block grid
    # input rows needed: -1 .. 2*h2 (pad-1 ring + round-up row), i.e.
    # 2*(h2+1) rows after a (1, 2*h2+1-h) pad. Padded pixels are consumed
    # only by sliced-off outputs or zero kernel taps.
    xp = jnp.pad(xd, ((0, 0), (1, 2 * h2 + 1 - h), (1, 2 * w2 + 1 - w),
                      (0, 0)))
    hb, wb = h2 + 1, w2 + 1
    x_even = xp[:, 0::2].reshape(b, hb, wb, 2 * ci)
    x_odd = xp[:, 1::2].reshape(b, hb, wb, 2 * ci)
    xs = jnp.concatenate([x_even, x_odd], axis=-1)   # (sy, sx, c) channels

    # packed kernel (2, 2, 4Ci, 4Co): packed tap (ty, tx) of output phase
    # (py, px) reads input phase (dy, dx) through original tap
    # (2*ty+dy-py, 2*tx+dx-px) when that lands inside the 3x3 kernel.
    zero = jnp.zeros_like(k[0, 0])                   # (Ci, Co)

    def tap(u, v):
        return k[u, v] if 0 <= u < 3 and 0 <= v < 3 else zero

    phases = [(0, 0), (0, 1), (1, 0), (1, 1)]        # (major, minor) order
    kp = jnp.stack([
        jnp.stack([
            jnp.concatenate([
                jnp.concatenate([tap(2 * ty + dy - py, 2 * tx + dx - px)
                                 for (py, px) in phases], axis=1)
                for (dy, dx) in phases], axis=0)
            for tx in range(2)])
        for ty in range(2)])
    out_p = jax.lax.conv_general_dilated(
        xs, kp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (b, h2, w2, 4Co)

    # depth-to-space: channels (py, px, co) -> pixels, then crop the
    # round-up row/col.
    o0 = out_p[..., :2 * co].reshape(b, h2, 2 * w2, co)
    o1 = out_p[..., 2 * co:].reshape(b, h2, 2 * w2, co)
    out = jnp.stack([o0, o1], axis=2).reshape(b, 2 * h2, 2 * w2, co)
    return out[:, :h, :w]


class Conv3x3(nn.Module):
    """3x3 pad-1 conv whose lowering adapts to the channel geometry.

    The refine decoder ends in very thin convs (e.g. post2: 4->1 channels at
    127x127) — as `lax.conv` they use one MXU column of 128 and profiled at
    ~34us/frame for ~0.6 MFLOP. When in*out channels are tiny AND the batch is
    1, a shift-accumulate over the 9 taps (elementwise multiply + channel sum,
    one VPU loop fusion) is ~4x faster (75->17us for post2); at batch 16 the
    VPU work scales linearly while the MXU conv amortizes, and the shift path
    LOSES (~15% aggregate serving throughput) — so the default is the MXU conv
    and only the single-stream tracker opts in (vmap hides the stream count
    from this module, so the choice must come from the caller). Parameters
    match nn.Conv ('kernel' (3,3,Ci,Co), 'bias' (Co,)), so checkpoints are
    unaffected either way.
    """
    features: int
    dtype: Any = jnp.float32
    shift_threshold: int = 0  # use shift lowering when 0 < Ci*Co <= this
    # use the block-2 output-packed lowering (see _conv3x3_packed) when
    # 0 < Co <= this and the shift path was not chosen. 0 = plain MXU conv.
    packed_threshold: int = 0

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        if ci * self.features > self.shift_threshold:
            if 0 < self.features <= self.packed_threshold:
                out = _conv3x3_packed(xd, k)
            else:
                out = jax.lax.conv_general_dilated(
                    xd, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            b, h, w, _ = x.shape
            xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = jnp.zeros((b, h, w, self.features), self.dtype)
            for dy in range(3):
                for dx in range(3):
                    tap = xp[:, dy:dy + h, dx:dx + w, :]
                    out = out + jnp.sum(tap[..., None] * k[dy, dx], axis=-2)
        return out + bias.astype(self.dtype)


class ConvReluBlock(nn.Module):
    """Two 3x3 pad-1 conv+ReLU layers (Refine's v/h blocks)."""
    mid: int
    out: int
    dtype: Any = jnp.float32
    thin_threshold: int = 0
    packed_threshold: int = 0

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv3x3(self.mid, self.dtype, self.thin_threshold,
                            self.packed_threshold, name="conv0")(x))
        return nn.relu(Conv3x3(self.out, self.dtype, self.thin_threshold,
                               self.packed_threshold, name="conv1")(x))


class Refine(nn.Module):
    """U-shaped mask refinement decoder.

    Consumes per-cell windows of the backbone skips — p0 61x61x64, p1 31x31x256,
    p2 15x15x512 — plus the cell's 256-d corr vector, and emits 127x127 mask logits.

    ``__call__`` operates on batched per-cell windows (B, ...) so both the
    inference path (one window sliced at the argmax cell) and the training path
    (all L cells unfolded) share one formulation.
    """
    dtype: Any = jnp.float32
    # Ci*Co at or below this use the VPU shift lowering (see Conv3x3); the
    # default 0 keeps every conv on the MXU — correct for training and
    # batched serving; the batch-1 tracker opts in via the model knob.
    thin_conv_threshold: int = 0
    # Co at or below this use the block-2 output-packed MXU lowering
    # (_conv3x3_packed) — a batched-path remedy for the same underfill the
    # shift lowering fixes at batch 1.
    packed_conv_threshold: int = 0
    # channel count of the per-cell corr vector (= the neck width; 256 at the
    # real model width, scaled down with the model's width knob)
    corr_features: int = 256

    def setup(self):
        d = self.dtype
        t = self.thin_conv_threshold
        p = self.packed_conv_threshold
        self.v0 = ConvReluBlock(16, 4, d, t, p, name="v0")
        self.v1 = ConvReluBlock(64, 16, d, t, p, name="v1")
        self.v2 = ConvReluBlock(128, 32, d, t, p, name="v2")
        self.h2 = ConvReluBlock(32, 32, d, t, p, name="h2")
        self.h1 = ConvReluBlock(16, 16, d, t, p, name="h1")
        self.h0 = ConvReluBlock(4, 4, d, t, p, name="h0")
        self.deconv = DeconvExpand(self.corr_features, 32, 15, d, name="deconv")
        self.post0 = Conv3x3(16, d, t, p, name="post0")
        self.post1 = Conv3x3(4, d, t, p, name="post1")
        self.post2 = Conv3x3(1, d, t, p, name="post2")

    def __call__(self, p0, p1, p2, corr):
        """p0 (B,61,61,64), p1 (B,31,31,256), p2 (B,15,15,512), corr (B,256)
        -> (B, 127*127) mask logits."""
        out = self.deconv(corr)                                   # (B,15,15,32)
        out = self.post0(upsample_nearest(self.h2(out) + self.v2(p2), (31, 31)))
        out = self.post1(upsample_nearest(self.h1(out) + self.v1(p1), (61, 61)))
        out = self.post2(upsample_nearest(self.h0(out) + self.v0(p0), (127, 127)))
        return out.reshape(out.shape[0], 127 * 127)


def slice_skip_windows(p0, p1, p2, pos_yx):
    """Inference-path window extraction at one score-map cell (custom.py:131-135).

    p0/p1/p2 are full search skip maps (1, H, W, C); pos_yx is a traced (row, col)
    int pair. The reference pads by (16, 8, 4) and slices windows of (61, 31, 15)
    at strides (4, 2, 1) relative to the cell index.

    Lowering the pad-then-slice literally (jnp.pad + dynamic_slice)
    materializes fully padded copies of all three maps — profiled at 260
    us/iter of pure zero-FLOP pad traffic in the 16-stream batched scan, plus
    one non-batchable dynamic_slice per stream. Clamped row/col gathers with
    an out-of-bounds mask produce the identical window, batch cleanly under
    vmap (one gather for all streams), and touch only window-sized buffers.
    """
    y, x = pos_yx[0], pos_yx[1]

    def win_gather(f, pad, scale, win):
        n = f.shape[1]
        r = scale * y - pad + jnp.arange(win)
        c = scale * x - pad + jnp.arange(win)
        # columns first: the row-gather output of the (H, W, C) map needed a
        # relayout before the column gather would consume it (profiled 6.8
        # us/frame on the p0 61-row slab); gathering the minor-tiled W axis
        # first leaves a row gather whose input layout already matches
        g = jnp.take(f, jnp.clip(c, 0, n - 1), axis=2,
                     mode="clip")
        g = jnp.take(g, jnp.clip(r, 0, n - 1), axis=1,
                     mode="clip")
        valid = ((r >= 0) & (r < n))[:, None] & ((c >= 0) & (c < n))[None, :]
        return g * valid.astype(g.dtype)[None, :, :, None]

    return (win_gather(p0, 16, 4, 61),
            win_gather(p1, 8, 2, 31),
            win_gather(p2, 4, 1, 15))


def unfold_skip_windows(p0, p1, p2):
    """Training-path window extraction for all cells (custom.py:137-142).

    Returns windows flattened over (batch, cell): (B*L, win, win, C) each, with L
    enumerated row-major — matching F.unfold's window order and the reference's
    ``view(-1, C, w, w)`` batch layout.
    """
    w0 = unfold_windows(p0, (61, 61), padding=0, stride=4)
    w1 = unfold_windows(p1, (31, 31), padding=0, stride=2)
    w2 = unfold_windows(p2, (15, 15), padding=0, stride=1)
    merge = lambda w: w.reshape((-1,) + w.shape[2:])
    return merge(w0), merge(w1), merge(w2)
