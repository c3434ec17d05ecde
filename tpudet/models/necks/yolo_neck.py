"""YOLOv3 neck (reference mmdet/models/necks/yolo_neck.py:137):
DetectionBlock (5 alternating 1x1/3x3 convs) per scale, 1x1 + 2x upsample
+ concat between scales, processed top (deep) to bottom.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import ConvModule, upsample_nearest_2x

LEAKY = dict(type='LeakyReLU', negative_slope=0.1)


class DetectionBlock(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_channels
        kw = dict(act=LEAKY, dtype=self.dtype)
        x = ConvModule(c, 1, name='conv1', **kw)(x, train)
        x = ConvModule(c * 2, 3, name='conv2', **kw)(x, train)
        x = ConvModule(c, 1, name='conv3', **kw)(x, train)
        x = ConvModule(c * 2, 3, name='conv4', **kw)(x, train)
        return ConvModule(c, 1, name='conv5', **kw)(x, train)


@NECKS.register_module()
class YOLOV3Neck(nn.Module):
    num_scales: int
    in_channels: Sequence[int]  # high-level first, e.g. [1024, 512, 256]
    out_channels: Sequence[int]  # e.g. [512, 256, 128]
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == self.num_scales
        outs = []
        out = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                             name='detect1')(feats[-1], train)
        outs.append(out)
        for i, x in enumerate(reversed(feats[:-1])):
            tmp = ConvModule(self.out_channels[i + 1], 1, act=LEAKY,
                             dtype=self.dtype, name=f'conv{i + 1}')(out, train)
            tmp = upsample_nearest_2x(tmp)
            tmp = jnp.concatenate([tmp, x], axis=-1)
            out = DetectionBlock(self.out_channels[i + 1], dtype=self.dtype,
                                 name=f'detect{i + 2}')(tmp, train)
            outs.append(out)
        return tuple(outs)
