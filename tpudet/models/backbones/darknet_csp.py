"""CSPDarknet backbone family (YOLOv4/YOLOv5), flax.linen NHWC.

Capability-parity rebuild of the reference DarknetCSP
(mmdet/models/backbones/darknetcsp.py:338-481): same arch table
(darknetcsp.py:357-380), same stage kinds (plain conv / bottleneck / CSP /
focus / SPP-v4 / SPP-v5), same channel arithmetic, BN eps=1e-3
momentum=0.03 (torch convention), Mish activations throughout.

TPU-first choices: NHWC layout, bias-free convs feeding shared-BN CSP
merges exactly as the reference wires them, computation dtype configurable
(bfloat16 for speed with fp32 BN statistics handled by flax).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES
import functools

from ..layers import (DARKNET_BN, Conv2d, max_pool_same)
from ..layers import BatchNormAct as _BatchNormAct
from ..layers import ConvModule as _ConvModule

# the whole CSP family uses the fork's BN convention
# (darknetcsp.py:387: eps=0.001, momentum=0.03)
ConvModule = functools.partial(_ConvModule, **DARKNET_BN)
BatchNormAct = functools.partial(_BatchNormAct, **DARKNET_BN)

ActCfg = Optional[Union[str, dict]]


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (darknetcsp.py:38-64)."""
    in_channels: int
    out_channels: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                       name='conv1')(x, train)
        y = ConvModule(self.out_channels, 3, groups=self.groups,
                       act=self.act, dtype=self.dtype, name='conv2')(y, train)
        if self.shortcut and self.in_channels == self.out_channels:
            return x + y
        return y


class BottleneckCSP(nn.Module):
    """CSP bottleneck: conv1->bottlenecks->conv3 branch, raw conv2 branch,
    shared BN+act over the concat, conv4 merge (darknetcsp.py:67-109)."""
    in_channels: int
    out_channels: int
    repetition: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y1 = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                        name='conv1')(x, train)
        for i in range(self.repetition):
            y1 = Bottleneck(hidden, hidden, self.shortcut, self.groups,
                            expansion=1.0, act=self.act, dtype=self.dtype,
                            name=f'bottlenecks_{i}')(y1, train)
        y1 = Conv2d(hidden, 1, dtype=self.dtype, name='conv3')(y1)
        y2 = Conv2d(hidden, 1, dtype=self.dtype, name='conv2')(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNormAct(act=self.csp_act, dtype=self.dtype,
                         name='csp_bn')(y, train)
        return ConvModule(self.out_channels, 1, act=self.act,
                          dtype=self.dtype, name='conv4')(y, train)


class BottleneckCSP2(nn.Module):
    """CSP2 variant used by the v4 neck: both branches stem from conv1
    (darknetcsp.py:112-153). hidden == out_channels."""
    in_channels: int
    out_channels: int
    repetition: int = 1
    shortcut: bool = False
    groups: int = 1
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels)
        x1 = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                        name='conv1')(x, train)
        y1 = x1
        for i in range(self.repetition):
            y1 = Bottleneck(hidden, hidden, self.shortcut, self.groups,
                            expansion=1.0, act=self.act, dtype=self.dtype,
                            name=f'bottlenecks_{i}')(y1, train)
        y2 = Conv2d(hidden, 1, dtype=self.dtype, name='conv2')(x1)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNormAct(act=self.csp_act, dtype=self.dtype,
                         name='csp_bn')(y, train)
        return ConvModule(self.out_channels, 1, act=self.act,
                          dtype=self.dtype, name='conv3')(y, train)


class SPPV5(nn.Module):
    """YOLOv5 SPP: 1x1 shrink, parallel 5/9/13 maxpools, 1x1 merge
    (darknetcsp.py:156-181)."""
    in_channels: int
    out_channels: int
    pooling_kernel_size: Tuple[int, ...] = (5, 9, 13)
    act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_channels // 2
        x = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                       name='conv1')(x, train)
        pools = [max_pool_same(x, k) for k in self.pooling_kernel_size]
        x = jnp.concatenate([x] + pools, axis=-1)
        return ConvModule(self.out_channels, 1, act=self.act,
                          dtype=self.dtype, name='conv2')(x, train)


class SPPV4(nn.Module):
    """CSP-SPP used by YOLOv4 (darknetcsp.py:184-229)."""
    in_channels: int
    out_channels: int
    expansion: float = 0.5
    pooling_kernel_size: Tuple[int, ...] = (5, 9, 13)
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(2 * self.out_channels * self.expansion)
        x1 = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                        name='conv1')(x, train)
        x1 = ConvModule(hidden, 3, act=self.act, dtype=self.dtype,
                        name='conv3')(x1, train)
        x1 = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                        name='conv4')(x1, train)
        pools = [max_pool_same(x1, k) for k in self.pooling_kernel_size]
        y1 = jnp.concatenate([x1] + pools, axis=-1)
        y1 = ConvModule(hidden, 1, act=self.act, dtype=self.dtype,
                        name='conv5')(y1, train)
        y1 = ConvModule(hidden, 3, act=self.act, dtype=self.dtype,
                        name='conv6')(y1, train)
        y2 = Conv2d(hidden, 1, dtype=self.dtype, name='conv2')(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNormAct(act=self.csp_act, dtype=self.dtype,
                         name='csp_bn')(y, train)
        return ConvModule(self.out_channels, 1, act=self.act,
                          dtype=self.dtype, name='conv7')(y, train)


class Focus(nn.Module):
    """YOLOv5 Focus, implemented (like the reference, darknetcsp.py:232-259)
    as a stride-2 conv with doubled kernel/padding — mathematically the
    space-to-depth + conv composition, and far friendlier to the MXU."""
    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    act: ActCfg = 'Mish'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size * 2
        pad = (self.kernel_size // 2) * 2
        return ConvModule(self.out_channels, k, stride=self.stride * 2,
                          padding=pad, groups=self.groups, act=self.act,
                          dtype=self.dtype, name='conv')(x, train)


@BACKBONES.register_module()
class DarknetCSP(nn.Module):
    """CSPDarknet-53 family.

    ``scale`` keys the arch table copied from darknetcsp.py:357-380:
    stage kinds x repetitions x channels. ``out_indices`` picks pyramid
    levels. ``frozen_stages`` is handled functionally at train time by the
    optimizer mask (see tpudet/train/optim.py), not by module state.
    """
    scale: str = 'v4l5p'
    out_indices: Tuple[int, ...] = (3, 4, 5)
    act: ActCfg = 'Mish'
    csp_act: ActCfg = 'Mish'
    dtype: Any = None

    arch_settings = {
        'v4s5p': [['conv', 'bottleneck', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 1, 3, 3, 1], [16, 32, 64, 128, 256, 256]],
        'v4m5p': [['conv', 'bottleneck', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 1, 5, 5, 3], [24, 48, 96, 192, 384, 384]],
        'v4l5p': [['conv', 'bottleneck', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 2, 8, 8, 4], [32, 64, 128, 256, 512, 512]],
        'v4x5p': [['conv', 'bottleneck', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 3, 11, 11, 5], [40, 80, 160, 320, 640, 640]],
        'v4l6p': [['conv', 'csp', 'csp', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 3, 15, 15, 7, 7],
                  [32, 64, 128, 256, 512, 1024, 512]],
        'v4x7p': [['conv', 'csp', 'csp', 'csp', 'csp', 'csp', 'csp', 'sppv4'],
                  [None, 1, 3, 15, 15, 7, 7, 7],
                  [40, 80, 160, 320, 640, 1280, 1280, 640]],
        'v5s5p': [['focus', 'csp', 'csp', 'csp', 'sppv5'], [None, 1, 3, 3, 1],
                  [32, 64, 128, 256, 512]],
        'v5m5p': [['focus', 'csp', 'csp', 'csp', 'sppv5'], [None, 2, 6, 6, 2],
                  [48, 96, 192, 384, 768]],
        'v5l5p': [['focus', 'csp', 'csp', 'csp', 'sppv5'], [None, 3, 9, 9, 3],
                  [64, 128, 256, 512, 1024]],
        'v5x5p': [['focus', 'csp', 'csp', 'csp', 'sppv5'],
                  [None, 4, 12, 12, 4], [80, 160, 320, 640, 1280]],
    }

    @classmethod
    def arch(cls, scale: str):
        if scale not in cls.arch_settings:
            raise KeyError(f'invalid scale {scale} for DarknetCSP')
        return cls.arch_settings[scale]

    @classmethod
    def out_channels(cls, scale: str,
                     out_indices: Sequence[int]) -> Tuple[int, ...]:
        _, _, channels = cls.arch(scale)
        return tuple(channels[i] for i in out_indices)

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages, repetitions, channels = self.arch(self.scale)
        kw = dict(act=self.act, dtype=self.dtype)
        csp_kw = dict(csp_act=self.csp_act, **kw)
        outs = []
        cin = x.shape[-1]
        for i, (stg, rep, cout) in enumerate(
                zip(stages, repetitions, channels)):
            name = f'{stg}{i}'
            if stg == 'conv':
                x = ConvModule(cout, 3, name=name, **kw)(x, train)
            elif stg == 'bottleneck':
                # reference BottleneckStage (darknetcsp.py:320-335) passes
                # `repetition` into Bottleneck's `shortcut` slot, yielding a
                # downscale conv + a single (shortcut) bottleneck; we
                # reproduce that behavior for weight-parity.
                x = ConvModule(cout, 3, stride=2, name=f'{name}_down',
                               **kw)(x, train)
                x = Bottleneck(cout, cout, shortcut=bool(rep),
                               name=f'{name}_block', **kw)(x, train)
            elif stg == 'csp':
                x = ConvModule(cout, 3, stride=2, name=f'{name}_down',
                               **kw)(x, train)
                x = BottleneckCSP(cout, cout, rep, name=f'{name}_csp',
                                  **csp_kw)(x, train)
            elif stg == 'focus':
                x = Focus(cin, cout, 3, name=name, **kw)(x, train)
            elif stg == 'sppv4':
                # SPPV4Stage (darknetcsp.py:300-317): down to 2*cout, CSP,
                # then SPP shrinking back to cout.
                x = ConvModule(cout * 2, 3, stride=2, name=f'{name}_down',
                               **kw)(x, train)
                x = BottleneckCSP(cout * 2, cout * 2, rep, name=f'{name}_csp',
                                  **csp_kw)(x, train)
                x = SPPV4(cout * 2, cout, name=f'{name}_spp',
                          **csp_kw)(x, train)
            elif stg == 'sppv5':
                # SPPV5Stage (darknetcsp.py:280-297): down, SPP, CSP.
                x = ConvModule(cout, 3, stride=2, name=f'{name}_down',
                               **kw)(x, train)
                x = SPPV5(cout, cout, name=f'{name}_spp', **kw)(x, train)
                x = BottleneckCSP(cout, cout, rep, name=f'{name}_csp',
                                  **csp_kw)(x, train)
            else:
                raise NotImplementedError(stg)
            cin = cout
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
