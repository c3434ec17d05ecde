"""HRNet backbone (reference mmdet/models/backbones/hrnet.py:203).

Parallel multi-resolution branches with repeated cross-resolution fusion:
stem (two stride-2 convs) -> stage1 (4 bottlenecks at 1/4) -> stages 2-4 of
HRModules. Fusion follows hrnet.py:120-181: up-fuse = 1x1 conv+BN + nearest
upsample, down-fuse = chained stride-2 3x3 conv+BN(+ReLU except last),
identity on the diagonal, ReLU after summation. Transitions add the new
lower-resolution branch from the previous last branch (hrnet.py:387-430).

The ``extra`` dict uses the reference config schema (stage1..stage4 with
num_modules/num_branches/block/num_blocks/num_channels).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax

from ...registry import BACKBONES
from ..layers import upsample_nearest_2x
from .resnet import BasicBlock, Bottleneck, bn, conv


def _upsample_pow2(x, times: int):
    for _ in range(times):
        x = upsample_nearest_2x(x)
    return x


class HRModule(nn.Module):
    num_branches: int
    block: str  # 'BASIC' | 'BOTTLENECK'
    num_blocks: Tuple[int, ...]
    channels: Tuple[int, ...]  # post-expansion channels per branch
    multiscale_output: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i in range(self.num_branches):
            v = xs[i]
            for k in range(self.num_blocks[i]):
                if self.block == 'BASIC':
                    ds = v.shape[-1] != self.channels[i]
                    v = BasicBlock(self.channels[i], downsample=ds,
                                   dtype=self.dtype,
                                   name=f'branch{i}_block{k}')(v, train)
                else:
                    planes = self.channels[i] // 4
                    ds = v.shape[-1] != self.channels[i]
                    v = Bottleneck(planes, downsample=ds, dtype=self.dtype,
                                   name=f'branch{i}_block{k}')(v, train)
            outs.append(v)
        if self.num_branches == 1:
            return outs

        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            y = outs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                if j > i:
                    v = conv(self.channels[i], 1, 1, self.dtype,
                             f'fuse{i}_{j}_conv')(outs[j])
                    v = bn(train, self.dtype, f'fuse{i}_{j}_bn')(v)
                    v = _upsample_pow2(v, j - i)
                else:
                    v = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        v = conv(ch, 3, 2, self.dtype,
                                 f'fuse{i}_{j}_conv{k}')(v)
                        v = bn(train, self.dtype, f'fuse{i}_{j}_bn{k}')(v)
                        if not last:
                            v = nn.relu(v)
                y = y + v
            fused.append(nn.relu(y))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Dict[str, Any]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: 2x stride-2 3x3 conv+BN+ReLU (hrnet.py:304-326)
        x = conv(64, 3, 2, self.dtype, 'conv1')(x)
        x = nn.relu(bn(train, self.dtype, 'bn1')(x))
        x = conv(64, 3, 2, self.dtype, 'conv2')(x)
        x = nn.relu(bn(train, self.dtype, 'bn2')(x))

        s1 = dict(self.extra['stage1'])
        n1 = s1['num_channels'][0]
        expansion = 4 if s1.get('block', 'BOTTLENECK') == 'BOTTLENECK' else 1
        for k in range(s1['num_blocks'][0]):
            if expansion == 4:
                x = Bottleneck(n1, downsample=(k == 0), dtype=self.dtype,
                               name=f'layer1_{k}')(x, train)
            else:
                x = BasicBlock(n1, downsample=(k == 0), dtype=self.dtype,
                               name=f'layer1_{k}')(x, train)
        prev_channels = [n1 * expansion]
        ys = [x]

        for st in (2, 3, 4):
            cfg = dict(self.extra[f'stage{st}'])
            blk = cfg.get('block', 'BASIC')
            exp = 4 if blk == 'BOTTLENECK' else 1
            cur_channels = [c * exp for c in cfg['num_channels']]
            nb = cfg['num_branches']

            # transition (hrnet.py:387-430)
            new_xs = []
            for i in range(nb):
                if i < len(prev_channels):
                    if prev_channels[i] != cur_channels[i]:
                        v = conv(cur_channels[i], 3, 1, self.dtype,
                                 f't{st}_{i}_conv')(ys[i])
                        v = nn.relu(bn(train, self.dtype,
                                       f't{st}_{i}_bn')(v))
                        new_xs.append(v)
                    else:
                        new_xs.append(ys[i])
                else:
                    v = ys[-1]
                    for k in range(i + 1 - len(prev_channels)):
                        last = k == i - len(prev_channels)
                        ch = cur_channels[i] if last else v.shape[-1]
                        v = conv(ch, 3, 2, self.dtype,
                                 f't{st}_{i}_conv{k}')(v)
                        v = nn.relu(bn(train, self.dtype,
                                       f't{st}_{i}_bn{k}')(v))
                    new_xs.append(v)

            for m in range(cfg['num_modules']):
                multiscale = not (st == 4 and m == cfg['num_modules'] - 1
                                  and not self.extra.get(
                                      'stage4_multiscale_output', True))
                new_xs = HRModule(nb, blk, tuple(cfg['num_blocks']),
                                  tuple(cur_channels),
                                  multiscale_output=multiscale,
                                  dtype=self.dtype,
                                  name=f'stage{st}_m{m}')(new_xs, train)
            ys = new_xs
            prev_channels = cur_channels
        return tuple(ys)
