"""YOLOv4/YOLOv5 PANet-CSP necks (flax.linen, NHWC).

Capability-parity rebuild of reference mmdet/models/necks/yolo_neck_csp.py:
top-down upsample+concat+CSP, then bottom-up stride-2-conv+concat+CSP.

V4 (reference :12-238): 1x1 pre-upsample convs, 1x1 backbone lateral convs,
``BottleneckCSP2`` merge blocks, final 3x3 out convs; the bottom-up path
concatenates the *input* of each pre-upsample conv (:210-211).

V5 (reference :241-449): no lateral convs, no out convs, ``BottleneckCSP``
merges; the bottom-up path concatenates the *output* of each pre-upsample
conv (:424-425).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ...registry import NECKS
from ..backbones.darknet_csp import BottleneckCSP, BottleneckCSP2
import functools

from ..layers import DARKNET_BN, upsample_nearest_2x
from ..layers import ConvModule as _ConvModule

# CSP necks keep the fork BN convention (yolo_neck_csp.py:48-49)
ConvModule = functools.partial(_ConvModule, **DARKNET_BN)

ActCfg = Optional[Union[str, dict]]


@NECKS.register_module()
class YOLOV4Neck(nn.Module):
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    csp_repetition: int = 3
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        num_levels = len(self.in_channels)
        kw = dict(act=self.act, dtype=self.dtype)
        csp_kw = dict(csp_act=self.csp_act, **kw)

        # top-down: level indices num_levels-1 .. 1 merge into level-1 maps
        x = inputs[-1]
        bottom_up_merge: List = []
        for i in range(num_levels - 1, 0, -1):
            bottom_channels = self.in_channels[i - 1]
            target = bottom_channels // 2
            inputs_bottom = ConvModule(
                target, 1, name=f'lateral_conv{i - 1}',
                **kw)(inputs[i - 1], train)
            # v4: the pre-conv input feeds the bottom-up merge (:210-211)
            bottom_up_merge.append(x)
            x = ConvModule(target, 1, name=f'pre_up_conv{i}', **kw)(x, train)
            x = upsample_nearest_2x(x)
            x = jnp.concatenate([inputs_bottom, x], axis=-1)
            x = BottleneckCSP2(2 * target, target, self.csp_repetition,
                               shortcut=False, name=f'td_csp{i - 1}',
                               **csp_kw)(x, train)

        # bottom-up
        outs = [x]
        for i in range(num_levels - 1):
            merge = bottom_up_merge.pop(-1)
            top_channels = merge.shape[-1]
            x = ConvModule(top_channels, 3, stride=2,
                           name=f'down_conv{i}', **kw)(x, train)
            x = jnp.concatenate([x, merge], axis=-1)
            x = BottleneckCSP2(2 * top_channels, top_channels,
                               self.csp_repetition, shortcut=False,
                               name=f'bu_csp{i}', **csp_kw)(x, train)
            outs.append(x)

        # v4-only 3x3 output convs (:179-187)
        return tuple(
            ConvModule(self.out_channels[i], 3, name=f'out_conv{i}',
                       **kw)(outs[i], train) for i in range(num_levels))


@NECKS.register_module()
class YOLOV5Neck(nn.Module):
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    csp_repetition: int = 3
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        num_levels = len(self.in_channels)
        kw = dict(act=self.act, dtype=self.dtype)
        csp_kw = dict(csp_act=self.csp_act, **kw)

        x = inputs[-1]
        bottom_up_merge: List = []
        for i in range(num_levels - 1, 0, -1):
            target = self.in_channels[i - 1]
            x = ConvModule(target, 1, name=f'pre_up_conv{i}', **kw)(x, train)
            # v5: the post-conv output feeds the bottom-up merge (:424-425)
            bottom_up_merge.append(x)
            up = upsample_nearest_2x(x)
            x = jnp.concatenate([inputs[i - 1], up], axis=-1)
            x = BottleneckCSP(2 * target, target, self.csp_repetition,
                              shortcut=False, name=f'td_csp{i - 1}',
                              **csp_kw)(x, train)

        outs = [x]
        for i in range(num_levels - 1):
            merge = bottom_up_merge.pop(-1)
            top_channels = merge.shape[-1]
            target = self.out_channels[i + 1]
            x = ConvModule(top_channels, 3, stride=2,
                           name=f'down_conv{i}', **kw)(x, train)
            x = jnp.concatenate([x, merge], axis=-1)
            x = BottleneckCSP(2 * top_channels, target, self.csp_repetition,
                              shortcut=False, name=f'bu_csp{i}',
                              **csp_kw)(x, train)
            outs.append(x)
        return tuple(outs)
