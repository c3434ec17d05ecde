"""FPN with CARAFE upsampling (reference mmdet/models/necks/
fpn_carafe.py; config configs/carafe/faster_rcnn_r50_fpn_carafe_1x).

Standard FPN topology (1x1 laterals, top-down adds, 3x3 fpn convs) where
every top-down 2x upsample is a CARAFEPack; extra levels come from
stride-2 3x3 convs on C5 then CARAFE-free additions, following the
reference's extra-level chain (fpn_carafe.py:145-214: downsampled extra
laterals whose upsampled versions are added back).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.carafe import CARAFEPack
from ...registry import NECKS
from ..layers import upsample_nearest_2x


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    upsample: str = 'carafe'  # 'carafe' | 'nearest'
    up_kernel: int = 5
    encoder_kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        c = self.out_channels
        n_back = len(self.in_channels) - self.start_level

        laterals = []
        for i in range(self.start_level, len(self.in_channels)):
            laterals.append(
                nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'lateral{i}')(inputs[i]))

        # extra downsampled laterals from the last backbone level
        extra = self.num_outs - n_back
        x = inputs[-1]
        for i in range(extra):
            x = nn.Conv(c, (3, 3), (2, 2), padding='SAME', use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'extra_lateral{i}')(x)
            laterals.append(x)

        # top-down: CARAFE (or nearest) upsample + add
        for i in range(len(laterals) - 1, 0, -1):
            if self.upsample == 'carafe':
                up = CARAFEPack(channels=c, up_kernel=self.up_kernel,
                                encoder_kernel=self.encoder_kernel,
                                dtype=self.dtype,
                                name=f'upsample{i}')(laterals[i])
            else:
                up = upsample_nearest_2x(laterals[i])
            th, tw = laterals[i - 1].shape[1:3]
            up = up[:, :th, :tw]
            laterals[i - 1] = laterals[i - 1] + up

        outs = []
        for i, lat in enumerate(laterals):
            outs.append(
                nn.Conv(c, (3, 3), padding='SAME', use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f'fpn_conv{i}')(lat))
        return tuple(outs)
