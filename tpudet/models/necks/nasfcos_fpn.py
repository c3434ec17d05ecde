"""NAS-FCOS FPN (reference mmdet/models/necks/nasfcos_fpn.py + mmcv
ops/merge_cells.py ConcatCell).

The searched topology over f0=C3, f1=C4, f2=C5:
c22_1 (f2,f2)->f3, c22_2 (f2,f2)->f4, c32 (f3,f2)->f5, c02 (f0,f2)->f6,
c42 (f4,f2)->f7, c36 (f3,f6)->f8, c61 (f6,f1)->f9; outputs
P3/P4/P5 = resize(f{9,8,7} + resize(f5), C{3,4,5} size), then stride-2
extra downsamples (act-norm-conv order, no act on the first).

A ConcatCell resizes both inputs to the larger spatial size (nearest up /
max-pool down), concatenates, and applies BN -> ReLU -> grouped 1x1
(groups = out_channels, i.e. each output channel mixes its own pair).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import upsample_nearest_2x


def _resize_to(x, hw):
    h, w = x.shape[1:3]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    if th > h:  # nearest upsample, then crop for non-divisible sizes
        while x.shape[1] < th or x.shape[2] < tw:
            x = upsample_nearest_2x(x)
        return x[:, :th, :tw]
    f = max(h // th, 1)
    x = nn.max_pool(x, (f, f), strides=(f, f))
    return x[:, :th, :tw]


class ConcatCell(nn.Module):
    out_channels: int
    with_input1_conv: bool = False
    with_input2_conv: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        def input_conv(x, name):
            x = nn.Conv(self.out_channels, (3, 3), padding='SAME',
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=name)(x)
            return jax.nn.relu(x)

        if self.with_input1_conv:
            x1 = input_conv(x1, 'input1_conv')
        if self.with_input2_conv:
            x2 = input_conv(x2, 'input2_conv')
        hw = max(x1.shape[1:3], x2.shape[1:3])
        x1 = _resize_to(x1, hw)
        x2 = _resize_to(x2, hw)
        x = jnp.concatenate([x1, x2], axis=-1)
        # out conv order ('norm', 'act', 'conv'), grouped 1x1
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='out_bn')(x)
        x = jax.nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       feature_group_count=self.out_channels,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.he_normal(),
                       name='out_conv')(x)


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        c = self.out_channels
        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            x = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'adapt{i}')(inputs[i])
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'adapt_bn{i}')(x)
            feats.append(jax.nn.relu(x))

        wiring = [('c22_1', 2, 2, True, True), ('c22_2', 2, 2, True, True),
                  ('c32', 3, 2, True, False), ('c02', 0, 2, True, False),
                  ('c42', 4, 2, True, True), ('c36', 3, 6, True, True),
                  ('c61', 6, 1, True, True)]
        for name, i1, i2, w1, w2 in wiring:
            feats.append(ConcatCell(c, w1, w2, dtype=self.dtype,
                                    name=name)(feats[i1], feats[i2], train))

        outs = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1, f5 = feats[idx], feats[5]
            f5r = jax.image.resize(
                f5, f5.shape[:1] + f1.shape[1:3] + f5.shape[3:], 'bilinear')
            s = f1 + f5r
            tgt = inputs[input_idx].shape[1:3]
            outs.append(jax.image.resize(
                s, s.shape[:1] + tgt + s.shape[3:], 'bilinear'))

        for i in range(self.num_outs - len(outs)):
            x = outs[-1]
            if i > 0:
                x = jax.nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'extra_bn{i}')(x)
            outs.append(nn.Conv(c, (3, 3), (2, 2), padding='SAME',
                                use_bias=True, dtype=self.dtype,
                                kernel_init=nn.initializers.he_normal(),
                                name=f'extra_conv{i}')(x))
        return tuple(outs)
