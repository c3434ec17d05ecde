"""Config -> model builders (reference mmdet/models/builder.py:6-59).

Builds flax modules from registry-keyed config dicts. Detector configs have
the same shape as the reference's (``backbone``/``neck``/``bbox_head`` +
``train_cfg``/``test_cfg``).
"""
from __future__ import annotations

import copy
from typing import Dict, Optional

from ..registry import MODELS, build_from_cfg


def _build(cfg: Dict, **default_args):
    return build_from_cfg(cfg, MODELS, default_args or None)


def build_backbone(cfg):
    return _build(copy.deepcopy(dict(cfg)))


def build_neck(cfg):
    return _build(copy.deepcopy(dict(cfg)))


def build_head(cfg):
    return _build(copy.deepcopy(dict(cfg)))


def build_loss(cfg):
    return _build(copy.deepcopy(dict(cfg)))


def build_detector(cfg, train_cfg: Optional[Dict] = None,
                   test_cfg: Optional[Dict] = None):
    """Build a detector module from a reference-shaped config dict."""
    cfg = copy.deepcopy(dict(cfg))
    det_type = cfg.pop('type')
    backbone_cfg = cfg.pop('backbone')
    neck_cfg = cfg.pop('neck', None)
    train_cfg = cfg.pop('train_cfg', None) if train_cfg is None else train_cfg
    test_cfg = cfg.pop('test_cfg', None) if test_cfg is None else test_cfg

    backbone = build_backbone(backbone_cfg)
    if neck_cfg is None:
        neck = None
    elif isinstance(neck_cfg, (list, tuple)):
        # chained necks, e.g. Libra R-CNN's [FPN, BFP]
        # (reference libra_faster_rcnn_r50_fpn_1x_coco.py:4-16)
        from .necks.fpn import ChainedNeck
        neck = ChainedNeck(
            necks=tuple(build_neck(c) for c in neck_cfg))
    else:
        neck = build_neck(neck_cfg)

    det_cls = MODELS.get(det_type)
    if det_cls is None:
        raise KeyError(f'{det_type} is not a registered detector')

    kwargs = dict(
        backbone=backbone,
        neck=neck,
        train_cfg=dict(train_cfg) if train_cfg else None,
        test_cfg=dict(test_cfg) if test_cfg else None)
    if 'teacher_config' in cfg:
        # KD detectors name a full detector config as the frozen teacher
        # (reference kd_one_stage.py:22-43 builds the teacher from
        # teacher_config + teacher_ckpt). The teacher's modules are built
        # here; its weights arrive via the checkpoint loader
        # (teacher_ckpt is a torch URL in the reference — load a
        # converted checkpoint with tools/model_converters/torch_to_jax).
        import os.path as osp
        tpath = cfg.pop('teacher_config')
        cfg.pop('teacher_ckpt', None)
        if not osp.isabs(tpath) and not osp.exists(tpath):
            root = osp.dirname(osp.dirname(osp.dirname(
                osp.abspath(__file__))))
            tpath = osp.join(root, tpath)
        from ..config import Config
        tcfg = copy.deepcopy(dict(Config.fromfile(tpath)['model']))
        kwargs['teacher_backbone'] = build_backbone(tcfg['backbone'])
        if tcfg.get('neck') is not None:
            kwargs['teacher_neck'] = build_neck(tcfg['neck'])
        kwargs['teacher_bbox_head'] = build_head(tcfg['bbox_head'])
    if 'rpn_head' in cfg:  # two-stage / RPN-only (reference two_stage.py)
        kwargs['rpn_head'] = build_head(cfg.pop('rpn_head'))
        if 'roi_head' in cfg:
            kwargs['roi_head'] = build_head(cfg.pop('roi_head'))
    elif 'roi_head' in cfg:  # FastRCNN: precomputed proposals, no RPN
        kwargs['roi_head'] = build_head(cfg.pop('roi_head'))
    else:
        kwargs['bbox_head'] = build_head(cfg.pop('bbox_head'))
    return det_cls(**kwargs, **cfg)
