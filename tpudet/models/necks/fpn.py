"""FPN neck (flax.linen, NHWC).

Capability rebuild of reference mmdet/models/necks/fpn.py:217: lateral 1x1
convs, nearest top-down merge, 3x3 output convs, optional extra levels via
stride-2 convs on inputs/outputs (RetinaNet uses
``add_extra_convs='on_input'``, ``num_outs=5``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax

from ...registry import NECKS
from ..layers import upsample_nearest_2x


def _conv(features, kernel, stride=1, dtype=None, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=True,
                   dtype=dtype,
                   kernel_init=nn.initializers.xavier_uniform(), name=name)


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Union[bool, str] = False  # False|'on_input'|'on_output'
    relu_before_extra_convs: bool = False
    norm: Optional[str] = None  # 'GN' for configs/gn family
    gn_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level

        def post_norm(x, name):
            if self.norm is None:
                return x
            from ..plugins import make_norm
            return make_norm(self.norm, train, dtype=self.dtype,
                             name=name, gn_groups=self.gn_groups)(x)

        laterals = [
            post_norm(
                _conv(self.out_channels, 1, dtype=self.dtype,
                      name=f'lateral_conv{i}')(inputs[self.start_level + i]),
                f'lateral_norm{i}')
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(
                laterals[i])
        outs = [
            post_norm(
                _conv(self.out_channels, 3, dtype=self.dtype,
                      name=f'fpn_conv{i}')(laterals[i]), f'fpn_norm{i}')
            for i in range(used)
        ]

        extra = self.num_outs - used
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(
                        nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                src = (inputs[-1]
                       if self.add_extra_convs == 'on_input' else outs[-1])
                for i in range(extra):
                    if i > 0 and self.relu_before_extra_convs:
                        src = jax.nn.relu(src)
                    src = _conv(self.out_channels, 3, stride=2,
                                dtype=self.dtype,
                                name=f'extra_conv{i}')(src)
                    outs.append(src)
        return tuple(outs)


@NECKS.register_module()
class PAFPN(FPN):
    """Path-Aggregation FPN (reference mmdet/models/necks/pafpn.py):
    FPN top-down, then an extra bottom-up path with stride-2 convs and
    3x3 output convs on the aggregated maps."""

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level

        laterals = [
            _conv(self.out_channels, 1, dtype=self.dtype,
                  name=f'lateral_conv{i}')(inputs[self.start_level + i])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(
                laterals[i])
        inter = [
            _conv(self.out_channels, 3, dtype=self.dtype,
                  name=f'fpn_conv{i}')(laterals[i]) for i in range(used)
        ]
        # bottom-up augmentation
        for i in range(used - 1):
            down = _conv(self.out_channels, 3, stride=2, dtype=self.dtype,
                         name=f'downsample_conv{i}')(inter[i])
            inter[i + 1] = inter[i + 1] + down
        outs = [inter[0]] + [
            _conv(self.out_channels, 3, dtype=self.dtype,
                  name=f'pafpn_conv{i}')(inter[i]) for i in range(1, used)
        ]

        extra = self.num_outs - used
        if extra > 0:
            src = (inputs[-1]
                   if self.add_extra_convs == 'on_input' else outs[-1])
            for i in range(extra):
                if not self.add_extra_convs:
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
                else:
                    src = _conv(self.out_channels, 3, stride=2,
                                dtype=self.dtype,
                                name=f'extra_conv{i}')(src)
                    outs.append(src)
        return tuple(outs)


class ChainedNeck(nn.Module):
    """Apply a sequence of necks (reference supports neck lists, e.g.
    Libra R-CNN's FPN -> BFP)."""
    necks: Any

    def __call__(self, inputs, train: bool = False):
        x = inputs
        for neck in self.necks:
            x = neck(x, train)
        return x
