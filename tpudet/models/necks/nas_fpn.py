"""NAS-FPN neck (flax.linen, NHWC).

Capability rebuild of reference mmdet/models/necks/nas_fpn.py:10 and the
mmcv merge cells it uses (mmcv/ops/merge_cells.py): each cell resizes both
inputs to a target size (nearest up / max-pool down), applies a binary op —
sum, or global-pool attention ``sigmoid(GAP(x2)) * x1 + x2`` — and then an
optional out-conv in (act, conv, norm) order. The searched 7-merge topology
per stack (gp_64_4 … gp_75_6) follows nas_fpn.py:128-158.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from .hrfpn import _pool_to, _resize_nearest


def _fit(x, size):
    h, w = x.shape[1:3]
    if (h, w) == tuple(size):
        return x
    if h <= size[0]:
        return _resize_nearest(x, size)
    return _pool_to(x, size, 'max')


class _OutConv(nn.Module):
    """mmcv merge-cell out conv: ReLU -> 3x3 conv -> (no norm by default)."""
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(x)
        return nn.Conv(self.channels, (3, 3), padding='SAME', use_bias=True,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name='conv')(x)


class SumCell(nn.Module):
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, out_size):
        x = _fit(x1, out_size) + _fit(x2, out_size)
        return _OutConv(self.channels, dtype=self.dtype, name='out')(x)


class GlobalPoolingCell(nn.Module):
    channels: int
    with_out_conv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, out_size):
        x1 = _fit(x1, out_size)
        x2 = _fit(x2, out_size)
        att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
        x = att * x1 + x2
        if self.with_out_conv:
            x = _OutConv(self.channels, dtype=self.dtype, name='out')(x)
        return x


@NECKS.register_module()
class NASFPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        used = len(self.in_channels) - self.start_level
        feats = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f'lateral_conv{i}')(inputs[self.start_level + i])
            for i in range(used)
        ]
        for i in range(self.num_outs - used):
            x = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'extra_conv{i}')(feats[-1])
            feats.append(nn.max_pool(x, (2, 2), strides=(2, 2)))
        assert len(feats) == 5, 'NAS-FPN topology is defined for 5 levels'
        p3, p4, p5, p6, p7 = feats

        for s in range(self.stack_times):
            c = self.out_channels
            sz = lambda p: p.shape[1:3]
            p4_1 = GlobalPoolingCell(c, dtype=self.dtype,
                                     name=f's{s}_gp_64_4')(p6, p4, sz(p4))
            p4_2 = SumCell(c, dtype=self.dtype,
                           name=f's{s}_sum_44_4')(p4_1, p4, sz(p4))
            p3 = SumCell(c, dtype=self.dtype,
                         name=f's{s}_sum_43_3')(p4_2, p3, sz(p3))
            p4 = SumCell(c, dtype=self.dtype,
                         name=f's{s}_sum_34_4')(p3, p4_2, sz(p4))
            p5_tmp = GlobalPoolingCell(c, with_out_conv=False,
                                       name=f's{s}_gp_43_5')(p4, p3, sz(p5))
            p5 = SumCell(c, dtype=self.dtype,
                         name=f's{s}_sum_55_5')(p5, p5_tmp, sz(p5))
            p7_tmp = GlobalPoolingCell(c, with_out_conv=False,
                                       name=f's{s}_gp_54_7')(p5, p4_2, sz(p7))
            p7 = SumCell(c, dtype=self.dtype,
                         name=f's{s}_sum_77_7')(p7, p7_tmp, sz(p7))
            p6 = GlobalPoolingCell(c, dtype=self.dtype,
                                   name=f's{s}_gp_75_6')(p7, p5, sz(p6))
        return p3, p4, p5, p6, p7
