"""RetinaNet head with per-level BatchNorm (reference
mmdet/models/dense_heads/retina_sepbn_head.py — the NAS-FPN head).

Conv kernels are shared across FPN levels while every level owns its own
BN statistics (the reference aliases ``.conv`` across levels after
building per-level ConvModules, retina_sepbn_head.py:64-67). Loss and
decode are inherited unchanged from the generic anchor machinery in
:class:`RetinaHead`.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax

from ...registry import HEADS
from ..layers import BN_EPS
from .retina_head import RetinaHead, _conv


@HEADS.register_module()
class RetinaSepBNHead(RetinaHead):
    num_ins: int = 5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == self.num_ins
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        # shared conv kernels (bias folded into the per-level BN)
        cls_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv{i}')
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv{i}')
            for i in range(self.stacked_convs)
        ]
        retina_cls = _conv(
            self.num_anchors * self.num_classes, self.dtype, 'retina_cls',
            bias_init=nn.initializers.constant(prior_bias))
        retina_reg = _conv(self.num_anchors * 4, self.dtype, 'retina_reg')

        cls_out, reg_out = [], []
        for lvl, feat in enumerate(feats):
            c = feat
            for i, conv in enumerate(cls_convs):
                c = conv(c)
                c = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=BN_EPS,
                                 dtype=self.dtype,
                                 name=f'cls_bn{i}_l{lvl}')(c)
                c = jax.nn.relu(c)
            r = feat
            for i, conv in enumerate(reg_convs):
                r = conv(r)
                r = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=BN_EPS,
                                 dtype=self.dtype,
                                 name=f'reg_bn{i}_l{lvl}')(r)
                r = jax.nn.relu(r)
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
        return tuple(cls_out), tuple(reg_out)
