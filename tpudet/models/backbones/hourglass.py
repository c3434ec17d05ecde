"""HourglassNet backbone (reference mmdet/models/backbones/hourglass.py):
stacked encoder-decoder modules for CornerNet/CentripetalNet.

Hourglass-104 = 2 stacks, downsample 5x, channels (256,256,384,384,384,512),
blocks (2,2,2,2,2,4). Each stack emits a ``feat_channel`` map at stride 4;
between stacks the features are fused back (conv1x1(inter) + remap(out)).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax

from ...registry import BACKBONES
from ..layers import upsample_nearest_2x
from .resnet import BasicBlock, bn, conv


class ResLayer(nn.Module):
    """Sequence of BasicBlocks; first (or last) block changes
    channels/stride (reference mmdet/models/utils/res_layer.py)."""
    planes: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.num_blocks
        for i in range(n):
            change = (i == 0) if self.downsample_first else (i == n - 1)
            stride = self.stride if change else 1
            # reference res_layer.py:61-74: with downsample_first=False the
            # blocks BEFORE the change point keep the input width
            # (inplanes -> inplanes); only the change block converts to
            # ``planes``. Before-the-fix every block used ``planes``, which
            # broke the residual add whenever in_channels != planes and
            # num_blocks > 1 (hourglass low3: 512 -> 384 with 2 blocks).
            planes = self.planes if (change or self.downsample_first) \
                else x.shape[-1]
            ds = change and (stride != 1 or x.shape[-1] != self.planes)
            x = BasicBlock(planes, stride=stride, downsample=ds,
                           dtype=self.dtype, name=f'block{i}')(x, train)
        return x


class HourglassModule(nn.Module):
    """Recursive hourglass (reference hourglass.py:10-82)."""
    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = ResLayer(cur_c, cur_b, dtype=self.dtype, name='up1')(x, train)
        low1 = ResLayer(next_c, cur_b, stride=2, dtype=self.dtype,
                        name='low1')(x, train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], dtype=self.dtype,
                                   name='low2')(low1, train)
        else:
            low2 = ResLayer(next_c, next_b, dtype=self.dtype,
                            name='low2')(low1, train)
        low3 = ResLayer(cur_c, cur_b, downsample_first=False,
                        dtype=self.dtype, name='low3')(low2, train)
        return up1 + upsample_nearest_2x(low3)


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.stage_channels) == len(self.stage_blocks)
        assert len(self.stage_channels) > self.downsample_times
        cur_c = self.stage_channels[0]

        # stem: 7x7/2 conv + BasicBlock 128->256 /2 (hourglass.py:139-141)
        x = conv(128, 7, 2, self.dtype, 'stem_conv')(x)
        x = bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu(x)
        inter = ResLayer(cur_c, 1, stride=2, dtype=self.dtype,
                         name='stem_res')(x, train)

        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, dtype=self.dtype,
                                 name=f'hourglass{i}')(inter, train)
            out = conv(self.feat_channel, 3, 1, self.dtype,
                       f'out_conv{i}')(hg)
            out = bn(train, self.dtype, f'out_bn{i}')(out)
            out = nn.relu(out)
            outs.append(out)
            if i < self.num_stacks - 1:
                a = conv(cur_c, 1, 1, self.dtype, f'conv1x1_{i}')(inter)
                a = bn(train, self.dtype, f'conv1x1_bn{i}')(a)
                b = conv(cur_c, 1, 1, self.dtype, f'remap_{i}')(out)
                b = bn(train, self.dtype, f'remap_bn{i}')(b)
                inter = BasicBlock(cur_c, dtype=self.dtype,
                                   name=f'inter{i}')(nn.relu(a + b), train)
        return tuple(outs)
