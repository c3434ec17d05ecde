"""RegNet backbone (reference mmdet/models/backbones/regnet.py):
stage widths/depths generated from the (w0, wa, wm, depth) quantized
linear parameterization, grouped bottlenecks with bottleneck_ratio 1.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import numpy as np

from ...registry import BACKBONES
from .resnet import bn, conv


def generate_regnet(w0: float, wa: float, wm: float, depth: int,
                    q: int = 8) -> Tuple[list, list]:
    """Per-block widths -> (stage_widths, stage_depths)."""
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(int(w))
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    return stage_widths, stage_depths


def adjust_width_group(widths, groups):
    """Widths divisible by their group widths (reference regnet.py)."""
    out_w, out_g = [], []
    for w in widths:
        g = min(groups, w)
        w = int(round(w / g) * g)
        out_w.append(w)
        out_g.append(g)
    return out_w, out_g


class RegBottleneck(nn.Module):
    width: int
    stride: int
    group_width: int
    downsample: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        groups = max(self.width // self.group_width, 1)
        out = conv(self.width, 1, 1, self.dtype, 'conv1')(x)
        out = bn(train, self.dtype, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.width, (3, 3), (self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], feature_group_count=groups,
                      use_bias=False, dtype=self.dtype,
                      kernel_init=nn.initializers.he_normal(),
                      name='conv2')(out)
        out = bn(train, self.dtype, 'bn2')(out)
        out = nn.relu(out)
        out = conv(self.width, 1, 1, self.dtype, 'conv3')(out)
        out = bn(train, self.dtype, 'bn3')(out)
        if self.downsample:
            identity = conv(self.width, 1, self.stride, self.dtype,
                            'ds_conv')(x)
            identity = bn(train, self.dtype, 'ds_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class RegNet(nn.Module):
    arch: str = 'regnetx_3.2gf'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = None

    arch_settings: Dict[str, Dict] = None

    ARCHS = {
        'regnetx_400mf': dict(w0=24, wa=24.48, wm=2.54, group_w=16,
                              depth=22),
        'regnetx_800mf': dict(w0=56, wa=35.73, wm=2.28, group_w=16,
                              depth=16),
        'regnetx_1.6gf': dict(w0=80, wa=34.01, wm=2.25, group_w=24,
                              depth=18),
        'regnetx_3.2gf': dict(w0=88, wa=26.31, wm=2.25, group_w=48,
                              depth=25),
        'regnetx_4.0gf': dict(w0=96, wa=38.65, wm=2.43, group_w=40,
                              depth=23),
        'regnetx_6.4gf': dict(w0=184, wa=60.83, wm=2.07, group_w=56,
                              depth=17),
        'regnetx_8.0gf': dict(w0=80, wa=49.56, wm=2.88, group_w=120,
                              depth=23),
        'regnetx_12gf': dict(w0=168, wa=73.36, wm=2.37, group_w=112,
                             depth=19),
    }

    @classmethod
    def stage_config(cls, arch: str):
        p = cls.ARCHS[arch]
        widths, depths = generate_regnet(p['w0'], p['wa'], p['wm'],
                                         p['depth'])
        widths, groups = adjust_width_group(widths, p['group_w'])
        return widths, depths, groups

    @classmethod
    def out_channels(cls, arch, out_indices):
        widths, _, _ = cls.stage_config(arch)
        return tuple(widths[i] for i in out_indices)

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths, depths, groups = self.stage_config(self.arch)
        x = nn.Conv(32, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='stem_conv')(x)
        x = bn(train, self.dtype, 'stem_bn')(x)
        x = nn.relu(x)
        outs = []
        for i, (w, d, g) in enumerate(zip(widths, depths, groups)):
            for j in range(d):
                stride = 2 if j == 0 else 1
                ds = j == 0
                x = RegBottleneck(w, stride, g, ds, dtype=self.dtype,
                                  name=f'stage{i + 1}_block{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
