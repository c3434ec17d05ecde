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
import jax
import jax.numpy as jnp

from ...registry import BACKBONES
import functools

from ..layers import (DARKNET_BN, Conv2d, get_activation, max_pool_same)
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


# ---------------------------------------------------------------------------
# Space-to-depth stem (TPU layout optimization, numerically EXACT).
#
# The first two convs of every v4 arch run on 640x640 tensors with 3/32
# channels. TPU vector memory tiles the minor (channel) dim to 128 lanes, so
# those tensors waste 4-40x of every tile, and profiling showed the stem
# region consuming ~30 ms of a 104 ms yolov4l-640 train step at 2.6-22
# TFLOP/s. The standard fix (used by the MLPerf TPU ResNet/SSD submissions)
# is to re-parameterize the stem in "block space": space-to-depth(2) the
# input to (H/2, W/2, 4C) and rewrite each conv as an equivalent conv over
# 2x2 pixel blocks with phase-packed channels. The rewrite below is an exact
# linear repacking of the ORIGINAL kernels (zero-filled where the original
# window does not reach), so parameters, gradients, and outputs are
# bit-equal in exact arithmetic to the standard path (see
# tests/test_models/test_s2d_stem.py), while every stem tensor becomes
# 128-channel and MXU/VPU-friendly.
# ---------------------------------------------------------------------------


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (r*2+s)*C + c
    for pixel phase (r, s) within each 2x2 block."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _repack_stem_kernel(w):
    """(3,3,Cin,Cout) stride-1 pad-1 kernel -> (3,3,4Cin,4Cout) block-space
    kernel producing the phase-packed output of the original conv.

    out[2i+u, 2j+v] = sum_{di,dj} X[2i+u+di, 2j+v+dj] W[di+1, dj+1] with
    input pixel 2i+u+di = 2(i+a)+r, i.e. di = 2a + r - u: each original tap
    lands at block offset (a, b) and input phase (r, s)."""
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for u in range(2):
        for v in range(2):
            for a in (-1, 0, 1):
                for b in (-1, 0, 1):
                    for r in range(2):
                        for s in range(2):
                            di, dj = 2 * a + r - u, 2 * b + s - v
                            if di not in (-1, 0, 1) or dj not in (-1, 0, 1):
                                continue
                            ci = (r * 2 + s) * cin
                            co = (u * 2 + v) * cout
                            wp = wp.at[a + 1, b + 1, ci:ci + cin,
                                       co:co + cout].set(w[di + 1, dj + 1])
    return wp


def _repack_down_kernel(w):
    """(3,3,Cin,Cout) stride-2 pad-1 kernel -> (2,2,4Cin,Cout) block-space
    kernel whose stride-1 (pad (1,0)) application on the phase-packed input
    equals the original stride-2 conv (and exits block space).

    out[i, j] = sum_{di,dj in 0..2} X[2i+di-1, 2j+dj-1] W[di, dj];
    di - 1 = 2a + r gives the block offset / input phase of each tap."""
    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for di in range(3):
        for dj in range(3):
            a, r = divmod(di - 1, 2)
            b, s = divmod(dj - 1, 2)
            ci = (r * 2 + s) * cin
            wp = wp.at[a + 1, b + 1, ci:ci + cin].set(w[di, dj])
    return wp


class _KernelHolder(nn.Module):
    """Bare conv kernel living at ``<parent>/<name>/kernel`` so the
    space-to-depth stem's param tree is IDENTICAL to the ConvModule tree it
    replaces (checkpoints interop either way)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.he_normal(), self.shape,
                          jnp.float32)


class PhaseBatchNorm(nn.Module):
    """BatchNorm over the TRUE channels of a phase-packed (..., 4C) tensor.

    Params/stats are (C,)-shaped and the phase axis folds into the
    reduction, so numerics match applying standard flax BatchNorm
    (use_fast_variance, fp32 stats, ra = m*ra + (1-m)*batch) to the
    un-packed (2H, 2W, C) tensor exactly."""
    channels: int
    bn_eps: float
    bn_momentum: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            xf = xf.reshape(xf.shape[:-1] + (4, c))
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) \
                - jnp.square(mean)
            if not self.is_initializing():
                m = self.bn_momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mean4, var4 = jnp.tile(mean, 4), jnp.tile(var, 4)
        y = (x.astype(jnp.float32) - mean4) * jax.lax.rsqrt(var4 +
                                                            self.bn_eps)
        y = y * jnp.tile(scale, 4) + jnp.tile(bias, 4)
        return y.astype(self.dtype or x.dtype)


class S2DStemConv(nn.Module):
    """Stage-0 3x3 conv + BN + act in block space: param tree identical to
    ``ConvModule(features, 3)`` (conv/kernel, bn/{scale,bias,mean,var});
    input and output are phase-packed (B, H/2, W/2, 4C)."""
    features: int
    act: ActCfg = 'Mish'
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    dtype: Any = None

    @nn.compact
    def __call__(self, xs2d, train: bool = False):
        cin = xs2d.shape[-1] // 4
        w = _KernelHolder((3, 3, cin, self.features), name='conv')()
        wp = _repack_stem_kernel(w)
        dtype = self.dtype or xs2d.dtype
        y = jax.lax.conv_general_dilated(
            xs2d.astype(dtype), wp.astype(dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = PhaseBatchNorm(self.features, self.bn_eps, self.bn_momentum,
                           dtype=self.dtype, name='bn')(y, train)
        act_fn = get_activation(self.act)
        return act_fn(y) if act_fn is not None else y


class S2DDownConv(nn.Module):
    """Stage-1 3x3/2 downsample conv + BN + act consuming the phase-packed
    stem output and EXITING block space; param tree identical to
    ``ConvModule(features, 3, stride=2)``."""
    features: int
    act: ActCfg = 'Mish'
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97
    dtype: Any = None

    @nn.compact
    def __call__(self, xs2d, train: bool = False):
        cin = xs2d.shape[-1] // 4
        w = _KernelHolder((3, 3, cin, self.features), name='conv')()
        wp = _repack_down_kernel(w)
        dtype = self.dtype or xs2d.dtype
        y = jax.lax.conv_general_dilated(
            xs2d.astype(dtype), wp.astype(dtype), (1, 1),
            ((1, 0), (1, 0)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, name='bn')(y)
        act_fn = get_activation(self.act)
        return act_fn(y) if act_fn is not None else y


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
    # run the stage-0 conv + stage-1 downsample in space-to-depth block
    # space (exact rewrite, see module docstrings above; parity test
    # tests/test_models/test_s2d_stem.py). Identical param tree either way.
    space_to_depth_stem: bool = True
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
        block_space = False

        def down_conv(cout_, name_):
            """stage-entry 3x3/2 conv — block-space variant when the stem
            ran in space-to-depth form (exits block space)."""
            nonlocal block_space
            if block_space:
                block_space = False
                return S2DDownConv(cout_, name=name_, **kw)
            return ConvModule(cout_, 3, stride=2, name=name_, **kw)

        for i, (stg, rep, cout) in enumerate(
                zip(stages, repetitions, channels)):
            name = f'{stg}{i}'
            if stg == 'conv':
                if (self.space_to_depth_stem and i == 0
                        and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                        and 0 not in self.out_indices):
                    x = space_to_depth(x)
                    x = S2DStemConv(cout, act=self.act, dtype=self.dtype,
                                    name=name)(x, train)
                    block_space = True
                else:
                    x = ConvModule(cout, 3, name=name, **kw)(x, train)
            elif stg == 'bottleneck':
                # reference BottleneckStage (darknetcsp.py:320-335) passes
                # `repetition` into Bottleneck's `shortcut` slot, yielding a
                # downscale conv + a single (shortcut) bottleneck; we
                # reproduce that behavior for weight-parity.
                x = down_conv(cout, f'{name}_down')(x, train)
                x = Bottleneck(cout, cout, shortcut=bool(rep),
                               name=f'{name}_block', **kw)(x, train)
            elif stg == 'csp':
                x = down_conv(cout, f'{name}_down')(x, train)
                x = BottleneckCSP(cout, cout, rep, name=f'{name}_csp',
                                  **csp_kw)(x, train)
            elif stg == 'focus':
                x = Focus(cin, cout, 3, name=name, **kw)(x, train)
            elif stg == 'sppv4':
                # SPPV4Stage (darknetcsp.py:300-317): down to 2*cout, CSP,
                # then SPP shrinking back to cout.
                x = down_conv(cout * 2, f'{name}_down')(x, train)
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
