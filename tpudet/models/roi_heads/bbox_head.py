"""RoI bbox head (reference mmdet/models/roi_heads/bbox_heads/
convfc_bbox_head.py Shared2FCBBoxHead): flatten pooled RoI features ->
2 shared FCs -> softmax classification (C+1) + class-specific DeltaXYWH
regression.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import HEADS


@HEADS.register_module()
class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """roi_feats (..., 7, 7, C) -> (cls_logits (..., C+1),
        deltas (..., 4*C or 4))."""
        lead = roi_feats.shape[:-3]
        x = roi_feats.reshape(lead + (-1,))
        for i in range(2):
            x = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'shared_fc{i}')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls, reg


@HEADS.register_module()
class Shared4Conv1FCBBoxHead(nn.Module):
    """4 shared convs + 1 shared FC variant (reference
    convfc_bbox_head.py Shared4Conv1FCBBoxHead, the GN/WS configs)."""
    num_classes: int
    in_channels: int = 256
    conv_out_channels: int = 256
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    norm: Any = None  # 'GN' for configs/gn, gn+ws
    gn_groups: int = 32
    conv_ws: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        lead = roi_feats.shape[:-3]
        x = roi_feats.reshape((-1,) + roi_feats.shape[-3:])
        for i in range(4):
            if self.conv_ws:
                from ..plugins import WSConv
                x = WSConv(self.conv_out_channels, 3, use_bias=self.norm
                           is None, dtype=self.dtype,
                           name=f'shared_conv{i}')(x)
            else:
                x = nn.Conv(self.conv_out_channels, (3, 3), padding='SAME',
                            use_bias=self.norm is None, dtype=self.dtype,
                            kernel_init=nn.initializers.he_normal(),
                            name=f'shared_conv{i}')(x)
            if self.norm is not None:
                from ..plugins import make_norm
                x = make_norm(self.norm, train, dtype=self.dtype,
                              name=f'shared_norm{i}',
                              gn_groups=self.gn_groups)(x)
            x = jax.nn.relu(x)
        x = x.reshape(lead + (-1,))
        x = jax.nn.relu(
            nn.Dense(self.fc_out_channels, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name='shared_fc')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name='fc_reg')(x)
        return cls, reg
