"""ResNet backbone family (flax.linen, NHWC).

Capability rebuild of reference mmdet/models/backbones/resnet.py (the
depth-table design: BasicBlock for 18/34, Bottleneck for 50/101/152,
deep_stem option, out_indices, style='pytorch' stride placement).
Needed for the generic anchor path (RetinaNet config, SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES

BN_MOMENTUM = 0.9  # torch BN default momentum 0.1
BN_EPS = 1e-5


def bn(train: bool, dtype=None, name=None):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)


def conv(features, kernel, stride=1, dtype=None, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   dtype=dtype, kernel_init=nn.initializers.he_normal(),
                   name=name)


def _make_conv(conv_ws: bool):
    """conv factory: plain he-normal conv or weight-standardized conv
    (gn+ws configs, reference mmcv ConvWS2d)."""
    if not conv_ws:
        return conv
    from ..plugins import WSConv

    def ws(features, kernel, stride=1, dtype=None, name=None):
        return WSConv(features, kernel, stride, dtype=dtype, name=name)
    return ws


def _norm(norm, gn_groups, train, dtype, name):
    from ..plugins import make_norm
    return make_norm(norm, train, dtype=dtype, name=name,
                     gn_groups=gn_groups, bn_eps=BN_EPS,
                     bn_momentum=BN_MOMENTUM)


def _apply_plugins(x, plugins, position, dtype, train):
    """Reference resnet.py:110-136 make_block_plugins/forward_plugin."""
    if not plugins:
        return x
    from ..plugins import build_plugin
    for i, p in enumerate(plugins):
        cfg = p['cfg'] if 'cfg' in p else p
        if p.get('position', 'after_conv3') != position:
            continue
        x = build_plugin(dict(cfg), x.shape[-1],
                         f"plugin_{position}_{i}", dtype)(x, train)
    return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = 'BN'
    gn_groups: int = 32
    conv_ws: bool = False
    plugins: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        cv = _make_conv(self.conv_ws)
        out = cv(self.planes, 3, self.stride, self.dtype, 'conv1')(x)
        out = _norm(self.norm, self.gn_groups, train, self.dtype,
                    'bn1')(out)
        out = nn.relu(out)
        out = _apply_plugins(out, self.plugins, 'after_conv1', self.dtype,
                             train)
        out = cv(self.planes, 3, 1, self.dtype, 'conv2')(out)
        out = _norm(self.norm, self.gn_groups, train, self.dtype,
                    'bn2')(out)
        out = _apply_plugins(out, self.plugins, 'after_conv2', self.dtype,
                             train)
        if self.downsample:
            identity = cv(self.planes, 1, self.stride, self.dtype,
                          'ds_conv')(x)
            identity = _norm(self.norm, self.gn_groups, train, self.dtype,
                             'ds_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    groups: int = 1  # >1 + base_width -> ResNeXt (reference resnext.py)
    base_width: int = 64
    with_dcn: bool = False  # DCNv2 on conv2 (reference configs/dcn)
    norm: str = 'BN'
    gn_groups: int = 32
    conv_ws: bool = False
    plugins: Any = None  # reference resnet.py:110-136 plugin cfgs
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups
        cv = _make_conv(self.conv_ws)
        # style='pytorch': stride on the 3x3 (reference resnet.py Bottleneck)
        out = cv(width, 1, 1, self.dtype, 'conv1')(x)
        out = _norm(self.norm, self.gn_groups, train, self.dtype,
                    'bn1')(out)
        out = nn.relu(out)
        out = _apply_plugins(out, self.plugins, 'after_conv1', self.dtype,
                             train)
        pad = 1
        if self.with_dcn:
            assert self.groups == 1, 'DCN + grouped conv not supported'
            from ...ops.deform_conv import ModulatedDeformConv2d
            out = ModulatedDeformConv2d(
                width, kernel_size=3, stride=self.stride, use_bias=False,
                dtype=self.dtype, name='conv2')(out)
        elif self.conv_ws:
            out = cv(width, 3, self.stride, self.dtype, 'conv2')(out)
        else:
            out = nn.Conv(width, (3, 3), (self.stride, self.stride),
                          padding=[(pad, pad), (pad, pad)],
                          feature_group_count=self.groups, use_bias=False,
                          dtype=self.dtype,
                          kernel_init=nn.initializers.he_normal(),
                          name='conv2')(out)
        out = _norm(self.norm, self.gn_groups, train, self.dtype,
                    'bn2')(out)
        out = nn.relu(out)
        out = _apply_plugins(out, self.plugins, 'after_conv2', self.dtype,
                             train)
        out = cv(self.planes * self.expansion, 1, 1, self.dtype,
                 'conv3')(out)
        out = _norm(self.norm, self.gn_groups, train, self.dtype,
                    'bn3')(out)
        out = _apply_plugins(out, self.plugins, 'after_conv3', self.dtype,
                             train)
        if self.downsample:
            identity = cv(self.planes * self.expansion, 1, self.stride,
                          self.dtype, 'ds_conv')(x)
            identity = _norm(self.norm, self.gn_groups, train, self.dtype,
                             'ds_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    base_channels: int = 64
    groups: int = 1
    base_width: int = 64
    # DCNv2 per stage (reference configs/dcn stage_with_dcn)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    # norm_cfg switch + weight standardization (configs/gn, gn+ws)
    norm: str = 'BN'
    gn_groups: int = 32
    conv_ws: bool = False
    # plugin list (reference resnet.py:110-136): dicts with
    # cfg=dict(type=...), stages=(bool x4), position='after_convN'
    plugins: Any = None
    dtype: Any = None

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    @classmethod
    def out_channels(cls, depth, out_indices):
        block, _ = cls.arch_settings[depth]
        exp = 4 if block is Bottleneck else 1
        return tuple(64 * 2**i * exp for i in out_indices)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = self.arch_settings[self.depth]
        if self.conv_ws:
            from ..plugins import WSConv
            x = WSConv(self.base_channels, 7, 2, dtype=self.dtype,
                       name='stem_conv')(x)
        else:
            x = nn.Conv(self.base_channels, (7, 7), (2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name='stem_conv')(x)
        x = _norm(self.norm, self.gn_groups, train, self.dtype,
                  'stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stage_plugins = None
            if self.plugins:
                stage_plugins = tuple(
                    p for p in self.plugins
                    if p.get('stages', (True,) * 4)[i])
            for j in range(num_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                expansion = 4 if block_cls is Bottleneck else 1
                needs_ds = (j == 0 and
                            (stride != 1
                             or x.shape[-1] != planes * expansion))
                kw = dict(dtype=self.dtype, norm=self.norm,
                          gn_groups=self.gn_groups, conv_ws=self.conv_ws,
                          plugins=stage_plugins)
                if block_cls is Bottleneck:
                    kw.update(groups=self.groups, base_width=self.base_width,
                              with_dcn=self.stage_with_dcn[i])
                x = block_cls(planes, stride, needs_ds,
                              name=f'layer{i + 1}_{j}', **kw)(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """ResNeXt (reference mmdet/models/backbones/resnext.py): grouped
    bottlenecks, e.g. depth=101, groups=32, base_width=4."""
    groups: int = 32
    base_width: int = 4


class Res2Bottleneck(nn.Module):
    """Res2Net bottle2neck (reference mmdet/models/backbones/res2net.py):
    the 3x3 stage splits the width into ``scales`` chunks processed
    hierarchically, each chunk's conv fed by the previous chunk's output."""
    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax.numpy as jnp
        identity = x
        width = int(self.planes * (self.base_width / 64.)) * 1
        total = width * self.scales
        out = conv(total, 1, 1, self.dtype, 'conv1')(x)
        out = bn(train, self.dtype, 'bn1')(out)
        out = nn.relu(out)

        chunks = [out[..., i * width:(i + 1) * width]
                  for i in range(self.scales)]
        outs = []
        prev = None
        for i in range(self.scales):
            if i == 0 and self.stride == 1 and not self.downsample:
                outs.append(chunks[i])  # identity branch for the 1st chunk
                continue
            inp = chunks[i]
            if prev is not None and self.stride == 1:
                inp = inp + prev
            y = nn.Conv(width, (3, 3), (self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'conv2_{i}')(inp)
            y = bn(train, self.dtype, f'bn2_{i}')(y)
            y = nn.relu(y)
            outs.append(y)
            prev = y
        out = jnp.concatenate(outs, axis=-1)

        out = conv(self.planes * self.expansion, 1, 1, self.dtype,
                   'conv3')(out)
        out = bn(train, self.dtype, 'bn3')(out)
        if self.downsample:
            identity = conv(self.planes * self.expansion, 1, self.stride,
                            self.dtype, 'ds_conv')(x)
            identity = bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class Res2Net(ResNet):
    """Res2Net (reference mmdet/models/backbones/res2net.py)."""
    scales: int = 4
    res2_base_width: int = 26

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = self.arch_settings[self.depth]
        x = nn.Conv(self.base_channels, (7, 7), (2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='stem_conv')(x)
        x = bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            for j in range(num_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                needs_ds = (j == 0 and (stride != 1
                                        or x.shape[-1] != planes * 4))
                x = Res2Bottleneck(planes, stride, needs_ds,
                                   scales=self.scales,
                                   base_width=self.res2_base_width,
                                   dtype=self.dtype,
                                   name=f'layer{i + 1}_{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
