"""ChannelMapper and DilatedEncoder necks (flax.linen, NHWC).

Capability rebuilds of:
- reference mmdet/models/necks/channel_mapper.py:10 — per-scale 3x3 conv to a
  common channel width, optional stride-2 extra outputs.
- reference mmdet/models/necks/dilated_encoder.py:51 — YOLOF's single-level
  encoder: 1x1 lateral + 3x3 fpn projections (conv+BN, no act) followed by a
  chain of dilated residual bottlenecks (dilations 2/4/6/8).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from ...registry import NECKS
from ..layers import ConvModule


@NECKS.register_module()
class ChannelMapper(nn.Module):
    """reference channel_mapper.py:94-102: conv per level, then stride-2
    extra convs chained off the last input / previous extra output."""
    in_channels: Sequence[int]
    out_channels: int = 256
    kernel_size: int = 3
    num_outs: Optional[int] = None
    act: Optional[Union[str, dict]] = 'ReLU'
    use_norm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        num_outs = self.num_outs or len(self.in_channels)
        outs = [
            ConvModule(self.out_channels, self.kernel_size, act=self.act,
                       use_norm=self.use_norm, use_bias=not self.use_norm,
                       dtype=self.dtype, name=f'conv{i}')(x, train)
            for i, x in enumerate(inputs)
        ]
        for i in range(num_outs - len(inputs)):
            src = inputs[-1] if i == 0 else outs[-1]
            outs.append(
                ConvModule(self.out_channels, 3, stride=2, act=self.act,
                           use_norm=self.use_norm, use_bias=not self.use_norm,
                           dtype=self.dtype, name=f'extra_conv{i}')(src,
                                                                    train))
        return tuple(outs)


class DilatedBottleneck(nn.Module):
    """reference dilated_encoder.py:9-47: 1x1 -> dilated 3x3 -> 1x1 with
    residual add; conv+BN+ReLU each."""
    mid_channels: int
    out_channels: int
    dilation: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvModule(self.mid_channels, 1, act='ReLU', dtype=self.dtype,
                         use_bias=True, name='conv1')(x, train)
        out = nn.Conv(self.mid_channels, (3, 3),
                      padding=[(self.dilation,) * 2, (self.dilation,) * 2],
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=True, dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.01),
                      name='conv2')(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        out = ConvModule(self.out_channels, 1, act='ReLU', dtype=self.dtype,
                         use_bias=True, name='conv3')(out, train)
        return out + identity


@NECKS.register_module()
class DilatedEncoder(nn.Module):
    """reference dilated_encoder.py:104-107: lateral 1x1 conv+BN (no act),
    3x3 conv+BN (no act), then the dilated residual chain. Takes the last
    backbone level, returns a 1-tuple."""
    in_channels: int = 2048
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Tuple[int, ...] = (2, 4, 6, 8)
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[-1] if isinstance(inputs, (tuple, list)) else inputs
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name='lateral_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name='lateral_norm')(x)
        x = nn.Conv(self.out_channels, (3, 3), padding='SAME', use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name='fpn_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='fpn_norm')(x)
        for i in range(self.num_residual_blocks):
            x = DilatedBottleneck(self.block_mid_channels, self.out_channels,
                                  self.block_dilations[i], dtype=self.dtype,
                                  name=f'block{i}')(x, train)
        return (x,)
