"""Double-Head R-CNN (reference mmdet/models/roi_heads/double_roi_head.py +
bbox_heads/double_bbox_head.py).

Disentangled branches on the shared RoI features: a convolutional branch
(BasicResBlock 256->1024 + residual bottlenecks, global-avg-pool + fc) for
regression, a 2-fc branch for classification.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS, HEADS
from ..backbones.resnet import Bottleneck, bn, conv
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


class DoubleConvFCBBoxHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        """roi_feats (..., 7, 7, C) -> (cls (..., C+1), deltas (..., 4C))."""
        lead = roi_feats.shape[:-3]
        roi_feats = roi_feats.reshape((-1,) + roi_feats.shape[-3:])
        # conv branch -> regression (double_bbox_head.py BasicResBlock +
        # bottlenecks)
        x = roi_feats
        identity = conv(self.conv_out_channels, 1, 1, self.dtype,
                        'res_ds_conv')(x)
        identity = bn(train, self.dtype, 'res_ds_bn')(identity)
        v = conv(x.shape[-1], 3, 1, self.dtype, 'res_conv1')(x)
        v = nn.relu(bn(train, self.dtype, 'res_bn1')(v))
        v = conv(self.conv_out_channels, 1, 1, self.dtype, 'res_conv2')(v)
        v = bn(train, self.dtype, 'res_bn2')(v)
        x = nn.relu(v + identity)
        for i in range(self.num_convs):
            x = Bottleneck(self.conv_out_channels // 4, dtype=self.dtype,
                           name=f'conv_branch{i}')(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        # reg_class_agnostic=False in the double-heads config -> 4*C
        deltas = nn.Dense(4 * self.num_classes, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name='fc_reg')(x)

        # fc branch -> classification
        y = roi_feats.reshape(roi_feats.shape[0], -1)
        for i in range(self.num_fcs):
            y = jax.nn.relu(
                nn.Dense(self.fc_out_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name=f'fc{i}')(y))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              kernel_init=nn.initializers.normal(0.01),
                              name='fc_cls')(y)
        return (cls_logits.reshape(lead + (-1,)).astype(jnp.float32),
                deltas.reshape(lead + (-1,)).astype(jnp.float32))


@HEADS.register_module()
class DoubleHeadRoIHead(StandardRoIHead):
    reg_loss_weight: float = 2.0
    cls_loss_weight: float = 2.0

    def setup(self):
        self.bbox_head = DoubleConvFCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype)

    def loss(self, cls_logits, deltas, labels, targets, pos,
             sampled, rois=None) -> Dict:
        out = StandardRoIHead.loss(self, cls_logits, deltas, labels,
                                   targets, pos, sampled)
        # reference double_roi_head config: loss weights 2.0 on both heads
        out['loss_cls'] = out['loss_cls'] * self.cls_loss_weight
        out['loss_bbox'] = out['loss_bbox'] * self.reg_loss_weight
        return out


@DETECTORS.register_module()
class DoubleHeadRCNN(TwoStageDetector):
    """Named alias for configs (reference configs/double_heads)."""
