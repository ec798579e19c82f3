"""A structurally-identical tiny SiamMask for trainer-mechanics tests.

The test host has ONE cpu core; compiling the real ResNet-50 training graph
takes tens of minutes there. This model mirrors the real module tree exactly —
param subtrees backbone.{conv1,bn1,layer1,layer2,layer3} / neck / rpn /
mask_corr / refine with the same output contracts — so optimizer labeling,
freeze schedules, loss plumbing, and mesh sharding are all exercised for real,
in seconds.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _TinyStage(nn.Module):
    features: int
    stride: int = 1
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, name="block0")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.bn_axis, name="bn0")(x)
        return nn.relu(x)


class TinySiamMask(nn.Module):
    """Same forward_train contract as SiamMaskSharp, ~1000x smaller."""
    anchor_num: int = 5
    o_sz: int = 63
    dtype: Any = jnp.float32
    bn_axis: str | None = None  # sync-BN axis, as on the real models

    def setup(self):
        self.backbone = TinyBackbone(bn_axis=self.bn_axis, name="backbone")
        self.neck = _TinyStage(8, bn_axis=self.bn_axis, name="neck")
        self.rpn = TinyRPN(self.anchor_num, name="rpn")
        self.mask_corr = TinyMaskHead(self.o_sz, name="mask_corr")
        self.refine = TinyRefine(name="refine")

    def forward_train(self, template, search, train_layers=(False, False),
                      train_backbone_neck=True, train_rpn=True):
        zf = self.neck(self.backbone(template, train_layers), train_backbone_neck)
        xf = self.neck(self.backbone(search, train_layers), train_backbone_neck)
        # correlation proxy: global-mean template modulation
        zvec = jnp.mean(zf, axis=(1, 2), keepdims=True)
        feat = xf * zvec
        # score grid matching the g_sz=127/stride-8 unfold of the mask label
        s = (search.shape[1] - 127) // 8 + 1
        feat = nn.avg_pool(feat, (feat.shape[1] - s + 1,) * 2, strides=(1, 1))
        score, loc = self.rpn(feat, train_rpn)
        pred_mask = self.refine(feat, self.o_sz)
        _ = self.mask_corr(feat)
        return score, loc, pred_mask


class TinyBackbone(nn.Module):
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train_layers=(False, False)):
        x = nn.Conv(4, (3, 3), strides=(4, 4), use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = _TinyStage(4, 2, self.bn_axis, name="layer1")(x, False)
        x = _TinyStage(8, 2, self.bn_axis, name="layer2")(x, train_layers[0])
        x = _TinyStage(8, 1, self.bn_axis, name="layer3")(x, train_layers[1])
        return x


class TinyRPN(nn.Module):
    anchor_num: int

    @nn.compact
    def __call__(self, feat, train=True):
        score = nn.Conv(2 * self.anchor_num, (1, 1), name="cls")(feat)
        loc = nn.Conv(4 * self.anchor_num, (1, 1), name="loc")(feat)
        return score, loc


class TinyMaskHead(nn.Module):
    o_sz: int

    @nn.compact
    def __call__(self, feat):
        return nn.Conv(4, (1, 1), name="mask")(feat)


class TinyRefine(nn.Module):
    @nn.compact
    def __call__(self, feat, o_sz):
        b, s1, s2, _ = feat.shape
        out = nn.Dense(127 * 127, name="deconv")(feat.reshape(b * s1 * s2, -1))
        return out
