"""FPG — Feature Pyramid Grids (reference mmdet/models/necks/fpg.py;
config configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py).

A grid of ``stack_times`` bottom-up pathways over ``num_outs`` levels.
Each cell fuses (sum):
- same-pathway up transition: stride-2 3x3 conv from the level below
  (within the current pathway);
- across-lateral 1x1 conv from the previous pathway, same level;
- across-down: nearest-2x upsample + 3x3 conv from the previous
  pathway's level above;
- across-skip 1x1 conv from the ORIGINAL laterals.
All transitions use the act-conv-BN order of the reference config.
``skip_inds[level]`` lists pathway indices where the level is passed
through unchanged (the reference's staircase schedule). Outputs take the
last pathway through a 3x3 conv.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import upsample_nearest_2x

DEFAULT_SKIPS = ((0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())


class _ACN(nn.Module):
    """act -> conv -> BN transition (reference order=('act','conv','norm'))."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    act_first: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.act_first:
            x = jax.nn.relu(x)
        x = nn.Conv(self.features, (self.kernel_size,) * 2,
                    (self.stride,) * 2, padding='SAME', use_bias=False,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name='conv')(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name='bn')(x)


@NECKS.register_module()
class FPG(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    inter_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    skip_inds: Tuple[Tuple[int, ...], ...] = DEFAULT_SKIPS
    start_level: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ic = self.inter_channels
        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            feats.append(
                nn.Conv(ic, (1, 1), use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'lateral{i}')(inputs[i]))
        while len(feats) < self.num_outs:
            # extra levels via stride-2 max pool (add_extra_convs=False)
            feats.append(nn.max_pool(feats[-1], (1, 1), strides=(2, 2)))

        origin = list(feats)
        outs = [feats]
        for s in range(self.stack_times):
            cur = outs[-1]
            nxt = []
            for lvl in range(self.num_outs):
                if s in self.skip_inds[lvl]:
                    nxt.append(cur[lvl])
                    continue
                total = _ACN(ic, 1, dtype=self.dtype,
                             name=f's{s}_l{lvl}_lateral')(cur[lvl], train)
                if lvl > 0:
                    total = total + _ACN(
                        ic, 3, 2, dtype=self.dtype,
                        name=f's{s}_l{lvl}_same_up')(nxt[-1], train)
                if lvl < self.num_outs - 1:
                    up = upsample_nearest_2x(cur[lvl + 1])
                    th, tw = cur[lvl].shape[1:3]
                    up = up[:, :th, :tw]
                    total = total + _ACN(
                        ic, 3, dtype=self.dtype,
                        name=f's{s}_l{lvl}_across_down')(up, train)
                total = total + _ACN(
                    ic, 1, dtype=self.dtype,
                    name=f's{s}_l{lvl}_skip')(origin[lvl], train)
                nxt.append(total)
            outs.append(nxt)

        final = []
        for lvl in range(self.num_outs):
            final.append(_ACN(self.out_channels, 3, dtype=self.dtype,
                              name=f'out{lvl}')(outs[-1][lvl], train))
        return tuple(final)
