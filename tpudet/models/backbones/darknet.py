"""Darknet-53 backbone (YOLOv3), flax.linen NHWC.

Capability rebuild of reference mmdet/models/backbones/darknet.py:212:
conv32 stem, then 5 stages of (stride-2 conv + N residual blocks), blocks
are 1x1-half -> 3x3 with residual add; BN + LeakyReLU(0.1).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from ...registry import BACKBONES
from ..layers import ConvModule

LEAKY = dict(type='LeakyReLU', negative_slope=0.1)


class ResBlock(nn.Module):
    in_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.in_channels // 2
        out = ConvModule(half, 1, act=LEAKY, dtype=self.dtype,
                         name='conv1')(x, train)
        out = ConvModule(self.in_channels, 3, act=LEAKY, dtype=self.dtype,
                         name='conv2')(out, train)
        return out + x


@BACKBONES.register_module()
class Darknet(nn.Module):
    depth: int = 53
    out_indices: Tuple[int, ...] = (3, 4, 5)
    dtype: Any = None

    arch_settings = {
        53: ((1, 2, 8, 8, 4), ((32, 64), (64, 128), (128, 256), (256, 512),
                               (512, 1024)))
    }

    @classmethod
    def out_channels(cls, depth, out_indices):
        _, channels = cls.arch_settings[depth]
        return tuple(channels[i - 1][1] for i in out_indices)

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers, channels = self.arch_settings[self.depth]
        x = ConvModule(32, 3, act=LEAKY, dtype=self.dtype,
                       name='conv1')(x, train)
        outs = []
        for i, (n_blocks, (cin, cout)) in enumerate(zip(layers, channels)):
            x = ConvModule(cout, 3, stride=2, act=LEAKY, dtype=self.dtype,
                           name=f'stage{i + 1}_down')(x, train)
            for j in range(n_blocks):
                x = ResBlock(cout, dtype=self.dtype,
                             name=f'stage{i + 1}_block{j}')(x, train)
            if i + 1 in self.out_indices:
                outs.append(x)
        return tuple(outs)
