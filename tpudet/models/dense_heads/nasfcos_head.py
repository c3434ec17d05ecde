"""NAS-FCOS head (reference mmdet/models/dense_heads/nasfcos_head.py):
FCOS with the searched branch structure
``dconv3x3(DCNv2) -> conv3x3 -> dconv3x3(DCNv2) -> conv1x1`` (each with
GN) in place of the plain 4-conv towers. Loss/decode inherit from
:class:`FCOSHead`.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import ModulatedDeformConv2d
from ...registry import DETECTORS, HEADS
from ..detectors.single_stage import SingleStageDetector
from .fcos_head import FCOSHead


@HEADS.register_module()
class NASFCOSHead(FCOSHead):
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        prior_bias = float(-math.log((1 - 0.01) / 0.01))
        arch = [('dcn', 3), ('conv', 3), ('dcn', 3), ('conv', 1)]

        def tower(name):
            ops = []
            for i, (kind, k) in enumerate(arch):
                if kind == 'dcn':
                    ops.append(ModulatedDeformConv2d(
                        self.feat_channels, kernel_size=k, use_bias=True,
                        dtype=self.dtype, name=f'{name}_dcn{i}'))
                else:
                    ops.append(nn.Conv(
                        self.feat_channels, (k, k), padding='SAME',
                        use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'{name}_conv{i}'))
                ops.append(nn.GroupNorm(num_groups=self.gn_groups,
                                        dtype=self.dtype,
                                        name=f'{name}_gn{i}'))
            return ops

        cls_tower, reg_tower = tower('cls'), tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(prior_bias),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding='SAME', dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_centerness = nn.Conv(1, (3, 3), padding='SAME',
                                  dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name='conv_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))

        def run(tower_ops, feat):
            x = feat
            for op, gn in zip(tower_ops[0::2], tower_ops[1::2]):
                x = jax.nn.relu(gn(op(x)))
            return x

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, feat in enumerate(feats):
            c = run(cls_tower, feat)
            r = run(reg_tower, feat)
            cls_out.append(conv_cls(c))
            reg_out.append(jnp.exp(
                conv_reg(r).astype(jnp.float32) * scales[lvl]))
            ctr_out.append(conv_centerness(r))
        return tuple(cls_out), tuple(reg_out), tuple(ctr_out)


@DETECTORS.register_module()
class NASFCOS(SingleStageDetector):
    """NAS-FCOS detector (reference mmdet/models/detectors/nasfcos.py)."""

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold', 0.6)
        cfg.pop('min_bbox_size', None)
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)
