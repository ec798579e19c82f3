"""Tracking-variant ResNet-50 backbone (stride-8, dilated layer3, pad-0 stem).

Reproduces the architecture of the reference `experiments/siammask_sharp/resnet.py`
(the published SiamMask backbone), re-expressed as flax/NHWC for TPU:

- 7x7 stride-2 stem with **padding 0** (resnet.py:154), then 3x3/2 maxpool pad 1.
- Bottleneck conv2 uses ``padding = 2 - stride`` and ``padding = dilation`` when
  dilated (resnet.py:66-72).
- layer2 stride 2: its first block and downsample use 3x3 stride-2 **pad-0** convs
  (resnet.py:194-206), shrinking 31->15 rather than halving.
- layer3 stride 1 dilation 2: the *first* block runs at dilation 1 with a 3x3 pad-1
  downsample, remaining blocks at dilation 2 (resnet.py:184-215 — note the
  ``dd = dilation // 2`` first-block quirk).
- layer4 is omitted (``layer4=False`` in `custom.py:31`).

Spatial flow: template 127 -> p0 61x61(64) -> p1 31x31(256) -> p2 15x15(512)
-> p3 15x15(1024); search 255 -> 125 / 63 / 31 / 31.

Returns all four stages; the sharp Refine head consumes p0..p2 as skip features.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 1 - 0.1).
BN_KW = dict(epsilon=1e-5, momentum=0.9)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1 bottleneck with optional downsample."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: str | None = None  # None | 'conv1x1' | 'conv3x3'
    # for the 3x3 downsample these mirror the reference's dd/padding, which derive
    # from the STAGE dilation (resnet.py:195-200), not this block's dilation
    downsample_dilation: int = 1
    downsample_pad: int = 0
    dtype: Any = jnp.float32
    # cross-replica BN-stat sync axis (sync-BN inside shard_map); None = local
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = 2 - self.stride
        if self.dilation > 1:
            padding = self.dilation

        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn1", **BN_KW)(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(padding, padding)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn2", **BN_KW)(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                           name="bn3", **BN_KW)(out)

        if self.downsample == "conv1x1":
            residual = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                                    name="downsample_bn", **BN_KW)(residual)
        elif self.downsample == "conv3x3":
            residual = nn.Conv(self.planes * 4, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=[(self.downsample_pad, self.downsample_pad)] * 2,
                               kernel_dilation=(self.downsample_dilation,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, axis_name=self.bn_axis,
                           dtype=self.dtype,
                                    name="downsample_bn", **BN_KW)(residual)

        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    """A stack of bottlenecks mirroring `_make_layer` (resnet.py:184-215)."""
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # First block: stride==1 and dilation==1 -> 1x1 downsample, else 3x3 with
        # dd = dilation // 2 (pad dd) when dilated, dd = 1 (pad 0) when strided.
        if self.stride == 1 and self.dilation == 1:
            downsample = "conv1x1"
            dd, ds_pad = 1, 0
        else:
            downsample = "conv3x3"
            if self.dilation > 1:
                dd = self.dilation // 2
                ds_pad = dd
            else:
                dd = 1
                ds_pad = 0

        # The first block runs at dilation dd (resnet.py:210 passes dd, not dilation).
        x = Bottleneck(self.planes, stride=self.stride, dilation=dd,
                       downsample=downsample, downsample_dilation=dd,
                       downsample_pad=ds_pad, dtype=self.dtype,
                       bn_axis=self.bn_axis, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dilation=self.dilation, dtype=self.dtype,
                           bn_axis=self.bn_axis, name=f"block{i}")(x, train)
        return x


class ResNet50Tracking(nn.Module):
    """ResNet-50 layers 1-3 tracking backbone. Input NHWC float32 (0..255 BGR,
    matching the reference's raw-pixel convention — no normalization).

    Progressive unfreezing (`models/features.py:36-79`, `custom.py:37-41`): the
    stem and layer1 are NEVER trained (their BN always runs in eval); layer2 and
    layer3 switch to train-mode BN only once unfrozen at 50% training progress.
    ``train_layer2``/``train_layer3`` carry those per-stage flags.

    ``width`` is the stem/base plane count (64 = the real ResNet-50). Reduced
    widths keep the exact module tree, spatial flow, and stage structure while
    shrinking every channel dim proportionally — used by the multi-chip dryrun
    to validate the full dp/collective program shape within a compile budget."""
    dtype: Any = jnp.float32
    bn_axis: str | None = None
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, train_layer2: bool = False,
                 train_layer3: bool = False):
        del train  # the stem/layer1 are permanently frozen (BN eval)
        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1", **BN_KW)(x)
        p0 = nn.relu(x)

        x = nn.max_pool(p0, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        p1 = ResNetStage(w, 3, dtype=self.dtype, bn_axis=self.bn_axis,
                         name="layer1")(x, False)
        p2 = ResNetStage(2 * w, 4, stride=2, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="layer2")(p1, train_layer2)
        p3 = ResNetStage(4 * w, 6, stride=1, dilation=2, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="layer3")(p2, train_layer3)
        return p0, p1, p2, p3
