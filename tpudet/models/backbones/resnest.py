"""ResNeSt backbone (reference mmdet/models/backbones/resnest.py).

ResNetV1d stem (deep 3-conv stem + avg-pool downsamples) with
split-attention bottlenecks: conv2 becomes a radix-grouped conv whose
branches are recombined by a radix-softmax attention over a squeezed
global descriptor (resnest.py:40-150); stride moves into a 3x3 avg pool
("avd", resnest.py:222-248).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from .resnet import bn, conv

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3),
        200: (3, 24, 36, 3)}


class SplitAttentionConv(nn.Module):
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = self.radix
        c = self.channels
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        pad = self.dilation * (self.kernel_size - 1) // 2
        v = nn.Conv(c * r, (self.kernel_size, self.kernel_size),
                    (self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name='conv')(x)
        v = bn(train, self.dtype, 'bn0')(v)
        v = nn.relu(v)
        b, h, w, _ = v.shape
        splits = v.reshape(b, h, w, r, c)  # radix-major channel blocks
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2),
                       keepdims=True)  # (B,1,1,C)
        g = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                    use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name='fc1')(gap)
        g = nn.relu(bn(train, self.dtype, 'bn1')(g))
        att = nn.Conv(c * r, (1, 1), feature_group_count=self.groups,
                      use_bias=True, dtype=self.dtype,
                      kernel_init=nn.initializers.he_normal(),
                      name='fc2')(g)  # (B,1,1,C*r)
        if r > 1:
            # radix softmax per (group, channel) (resnest.py RSoftmax)
            att = att.reshape(b, 1, 1, r, c)
            att = jax.nn.softmax(att, axis=3)
            out = jnp.sum(att * splits, axis=3)
        else:
            out = jax.nn.sigmoid(att) * v
        return out


class SplAtBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        if self.groups == 1:
            width = self.planes
        else:
            width = math.floor(self.planes *
                               (self.base_width / 64)) * self.groups
        avd = self.avg_down_stride and self.stride > 1
        identity = x
        out = conv(width, 1, 1, self.dtype, 'conv1')(x)
        out = nn.relu(bn(train, self.dtype, 'bn1')(out))
        out = SplitAttentionConv(
            width, 3, stride=1 if avd else self.stride, groups=self.groups,
            radix=self.radix, reduction_factor=self.reduction_factor,
            dtype=self.dtype, name='conv2')(out, train)
        if avd:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=[(1, 1), (1, 1)])
        out = conv(self.planes * 4, 1, 1, self.dtype, 'conv3')(out)
        out = bn(train, self.dtype, 'bn3')(out)
        if self.downsample:
            # ResNetV1d avg_down: avg pool then 1x1 stride-1 conv
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = conv(self.planes * 4, 1, 1, self.dtype,
                            'ds_conv')(identity)
            identity = bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeSt(nn.Module):
    depth: int = 50
    stem_channels: int = 64
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # deep stem (ResNetV1d): 3x3/2 -> 3x3 -> 3x3, then maxpool/2
        half = self.stem_channels // 2
        x = conv(half, 3, 2, self.dtype, 'stem_conv1')(x)
        x = nn.relu(bn(train, self.dtype, 'stem_bn1')(x))
        x = conv(half, 3, 1, self.dtype, 'stem_conv2')(x)
        x = nn.relu(bn(train, self.dtype, 'stem_bn2')(x))
        x = conv(self.stem_channels, 3, 1, self.dtype, 'stem_conv3')(x)
        x = nn.relu(bn(train, self.dtype, 'stem_bn3')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        blocks = ARCH[self.depth]
        planes = 64
        for stage, n in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = SplAtBottleneck(
                    planes, stride=stride if i == 0 else 1,
                    downsample=(i == 0), groups=self.groups,
                    base_width=self.base_width, radix=self.radix,
                    reduction_factor=self.reduction_factor, dtype=self.dtype,
                    name=f'layer{stage + 1}_{i}')(x, train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
