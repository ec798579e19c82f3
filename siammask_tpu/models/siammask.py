"""Model assemblies: SiamRPN (box-only), SiamMaskBase (63x63 masks), SiamMaskSharp
(refined 127x127 masks — the flagship).

Functional re-design of the reference model core (`models/siammask_sharp.py`,
`models/siamrpn.py`, `experiments/*/custom.py`): instead of stateful modules caching
``self.zf``/``self.feature``, every entry point is a pure flax method — template
features and cached search products are explicit values threaded by the tracker.

Entry points (invoke via ``model.apply(vars, ..., method=...)``):

- ``template(z)``             -> zf (B, 7, 7, 256)
- ``track(zf, x)``            -> (score, loc)                       [SiamRPN path]
- ``track_mask(zf, x)``       -> TrackOutputs(score, loc, mask, skips, corr)
- ``track_refine(skips, corr, pos_yx)`` -> (B, 127*127) logits      [sharp only]
- ``forward_train(template, search)``   -> training predictions

Layout is NHWC; cls channels are ordered (2, k) and loc channels (4, k) exactly as
the reference (`models/siammask.py:70-75` softmax view), so decode and losses index
the same way.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siammask_tpu.models.heads import (MaskCorr, Refine, ResDownS, UP,
                                       slice_skip_windows, unfold_skip_windows)
from siammask_tpu.models.resnet import ResNet50Tracking


class TrackOutputs(NamedTuple):
    score: jax.Array        # (B, S, S, 2k)
    loc: jax.Array          # (B, S, S, 4k)
    mask: jax.Array | None  # (B, S, S, o_sz^2) raw mask-head logits (base path)
    skips: tuple | None     # (p0, p1, p2) full search skip maps (sharp)
    corr: jax.Array | None  # (B, S, S, 256) mask-branch corr feature (sharp)


class SiamRPN(nn.Module):
    """Box-only tracker: backbone + neck + RPN heads (models/siamrpn.py)."""
    anchor_num: int = 5
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    # cross-replica BN-stat sync axis (sync-BN; set inside shard_map via
    # model.clone(bn_axis="data")); None = local/global-batch stats
    bn_axis: str | None = None
    # backbone base width; 64 = the real model. Reduced widths keep the exact
    # module tree / spatial geometry (dryrun compile-budget knob).
    width: int = 64
    # space-to-depth stem lowering (resnet.SpaceToDepthStem): a batch-1
    # latency win; the Tracker's single-stream clone turns it on
    stem_s2d: bool = False
    maxpool_phase: bool = False  # see resnet.maxpool_3x3s2_p1_phase

    def setup(self):
        self.backbone = ResNet50Tracking(dtype=self.dtype, bn_axis=self.bn_axis,
                                         width=self.width,
                                         stem_s2d=self.stem_s2d,
                                         maxpool_phase=self.maxpool_phase,
                                         name="backbone")
        self.neck = ResDownS(4 * self.width, dtype=self.dtype,
                             bn_axis=self.bn_axis, name="neck")
        self.rpn = UP(self.anchor_num, feature_out=4 * self.width,
                      xcorr_impl=self.xcorr_impl,
                      dtype=self.dtype, bn_axis=self.bn_axis, name="rpn")

    def _features(self, x, train=False, train_layers=(False, False)):
        p0, p1, p2, p3 = self.backbone(x, train_layer2=train_layers[0],
                                       train_layer3=train_layers[1])
        return (p0, p1, p2), self.neck(p3, train)

    def template(self, z, train: bool = False):
        return self._features(z, train)[1]

    def track(self, zf, x, train: bool = False):
        _, xf = self._features(x, train)
        return self.rpn(zf, xf, train)

    def forward_train(self, template, search, train_layers=(False, False)):
        _, zf = self._features(template, train=True, train_layers=train_layers)
        _, xf = self._features(search, train=True, train_layers=train_layers)
        return self.rpn(zf, xf, train=True)

    def __call__(self, template, search):
        # convenience path used for initialization / compile checks
        zf = self.template(template)
        return self.track(zf, search)


class SiamMaskBase(nn.Module):
    """Mask tracker without refinement: mask head emits 63x63 per cell."""
    anchor_num: int = 5
    o_sz: int = 63
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    bn_axis: str | None = None
    width: int = 64
    stem_s2d: bool = False  # see SiamRPN.stem_s2d
    maxpool_phase: bool = False  # see SiamRPN.maxpool_phase

    def setup(self):
        self.backbone = ResNet50Tracking(dtype=self.dtype, bn_axis=self.bn_axis,
                                         width=self.width,
                                         stem_s2d=self.stem_s2d,
                                         maxpool_phase=self.maxpool_phase,
                                         name="backbone")
        self.neck = ResDownS(4 * self.width, dtype=self.dtype,
                             bn_axis=self.bn_axis, name="neck")
        self.rpn = UP(self.anchor_num, feature_out=4 * self.width,
                      xcorr_impl=self.xcorr_impl,
                      dtype=self.dtype, bn_axis=self.bn_axis, name="rpn")
        self.mask_corr = MaskCorr(self.o_sz, hidden=4 * self.width,
                                  xcorr_impl=self.xcorr_impl,
                                  dtype=self.dtype, bn_axis=self.bn_axis,
                                  name="mask_corr")

    def _features(self, x, train=False, train_layers=(False, False)):
        p0, p1, p2, p3 = self.backbone(x, train_layer2=train_layers[0],
                                       train_layer3=train_layers[1])
        return (p0, p1, p2), self.neck(p3, train)

    def template(self, z, train: bool = False):
        return self._features(z, train)[1]

    def track(self, zf, x, train: bool = False):
        _, xf = self._features(x, train)
        return self.rpn(zf, xf, train)

    def track_mask(self, zf, x, train: bool = False) -> TrackOutputs:
        _, xf = self._features(x, train)
        score, loc = self.rpn(zf, xf, train)
        mask = self.mask_corr(zf, xf, train)
        return TrackOutputs(score, loc, mask, None, None)

    def forward_train(self, template, search, train_layers=(False, False)):
        _, zf = self._features(template, train=True, train_layers=train_layers)
        _, xf = self._features(search, train=True, train_layers=train_layers)
        score, loc = self.rpn(zf, xf, train=True)
        mask = self.mask_corr(zf, xf, train=True)
        return TrackOutputs(score, loc, mask, None, None)

    def __call__(self, template, search):
        zf = self.template(template)
        return self.track_mask(zf, search)


class SiamMaskSharp(nn.Module):
    """Flagship: mask branch + U-shaped Refine to 127x127
    (models/siammask_sharp.py + experiments/siammask_sharp/custom.py)."""
    anchor_num: int = 5
    xcorr_impl: str = "mm"
    dtype: Any = jnp.float32
    bn_axis: str | None = None
    # VPU shift lowering cutoff for the Refine decoder's thin tail convs
    # (see heads.Conv3x3): 0 = MXU everywhere (training / batched serving);
    # the batch-1 tracker clones the model with 128 (tracker.py).
    thin_conv_threshold: int = 0
    # block-2 output-packed lowering cutoff for the same thin convs on the
    # BATCHED paths (heads._conv3x3_packed): Co <= this run as a 2x2 conv
    # over space-to-depth-packed pixels, 4x the MXU output-lane fill.
    packed_conv_threshold: int = 0
    width: int = 64
    stem_s2d: bool = False  # see SiamRPN.stem_s2d
    maxpool_phase: bool = False  # see SiamRPN.maxpool_phase

    def setup(self):
        self.backbone = ResNet50Tracking(dtype=self.dtype, bn_axis=self.bn_axis,
                                         width=self.width,
                                         stem_s2d=self.stem_s2d,
                                         maxpool_phase=self.maxpool_phase,
                                         name="backbone")
        self.neck = ResDownS(4 * self.width, dtype=self.dtype,
                             bn_axis=self.bn_axis, name="neck")
        self.rpn = UP(self.anchor_num, feature_out=4 * self.width,
                      xcorr_impl=self.xcorr_impl,
                      dtype=self.dtype, bn_axis=self.bn_axis, name="rpn")
        self.mask_corr = MaskCorr(63, hidden=4 * self.width,
                                  xcorr_impl=self.xcorr_impl,
                                  dtype=self.dtype, bn_axis=self.bn_axis,
                                  name="mask_corr")
        self.refine = Refine(dtype=self.dtype,
                             thin_conv_threshold=self.thin_conv_threshold,
                             packed_conv_threshold=self.packed_conv_threshold,
                             corr_features=4 * self.width,
                             name="refine")

    def _features(self, x, train=False, train_layers=(False, False)):
        p0, p1, p2, p3 = self.backbone(x, train_layer2=train_layers[0],
                                       train_layer3=train_layers[1])
        return (p0, p1, p2), self.neck(p3, train)

    def template(self, z, train: bool = False):
        return self._features(z, train)[1]

    def track(self, zf, x, train: bool = False):
        _, xf = self._features(x, train)
        return self.rpn(zf, xf, train)

    def track_mask(self, zf, x, train: bool = False) -> TrackOutputs:
        """One search-frame pass: RPN heads + mask corr feature + raw mask head.

        Mirrors `custom.py:181-186`, returning the skip maps and corr feature the
        refine step consumes (explicitly, instead of the reference's self.* cache).
        """
        skips, xf = self._features(x, train)
        score, loc = self.rpn(zf, xf, train)
        corr = self.mask_corr.mask.forward_corr(zf, xf, train)
        mask = self.mask_corr.mask.head(corr, train)
        return TrackOutputs(score, loc, mask, skips, corr)

    def track_refine(self, skips, corr, pos_yx):
        """Refined 127x127 mask logits at one score-map cell (custom.py:188-190).

        pos_yx is a traced (row, col) pair — dynamic-sliced, so one compiled
        program serves every cell."""
        w0, w1, w2 = slice_skip_windows(*skips, pos_yx)
        cvec = jax.lax.dynamic_slice(
            corr, (0, pos_yx[0], pos_yx[1], 0),
            (corr.shape[0], 1, 1, corr.shape[3])).reshape(corr.shape[0], -1)
        return self.refine(w0, w1, w2, cvec)

    def refine_all(self, skips, corr):
        """Training path: refine every score-map cell (custom.py:137-147 pos=None).

        Returns (B*L, 127*127) with cells row-major within each sample."""
        w0, w1, w2 = unfold_skip_windows(*skips)
        b, h, w, c = corr.shape
        cvec = corr.reshape(b * h * w, c)
        return self.refine(w0, w1, w2, cvec)

    def forward_train(self, template, search, train_layers=(False, False),
                      train_backbone_neck=True, train_rpn=True):
        """Full training graph (models/siammask_sharp.py:57-69): RPN preds + refined
        masks for all cells.

        Stage-2 refine training (`tools/train_siammask_refine.py:98-104,168-183`)
        freezes backbone+rpn in eval: pass train_layers=(False, False),
        train_backbone_neck=False, train_rpn=False."""
        _, zf = self._features(template, train=train_backbone_neck,
                               train_layers=train_layers)
        skips, xf = self._features(search, train=train_backbone_neck,
                                   train_layers=train_layers)
        score, loc = self.rpn(zf, xf, train=train_rpn)
        corr = self.mask_corr.mask.forward_corr(zf, xf, train=True)
        pred_mask = self.refine_all(skips, corr)
        return score, loc, pred_mask

    def __call__(self, template, search):
        zf = self.template(template)
        out = self.track_mask(zf, search)
        mask = self.track_refine(out.skips, out.corr,
                                 jnp.array([12, 12], dtype=jnp.int32))
        return out.score, out.loc, mask


def log_softmax_cls(score: jax.Array, anchor_num: int) -> jax.Array:
    """Training-time cls activation (models/siammask.py:70-75): NHWC (B,S,S,2k)
    -> (B, k, S, S, 2) log-softmax over the 2-way axis."""
    b, h, w, _ = score.shape
    s = score.reshape(b, h, w, 2, anchor_num)        # channel dim is (2, k)
    s = jnp.transpose(s, (0, 4, 1, 2, 3))            # (B, k, S, S, 2)
    return jax.nn.log_softmax(s, axis=-1)
