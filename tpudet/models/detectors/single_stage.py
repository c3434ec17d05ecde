"""Single-stage detector: backbone -> neck -> dense head.

Functional rebuild of reference mmdet/models/detectors/single_stage.py:138
and the forward-dispatch machinery of base.py:156-254. There is no
train/test forward branching object here: the flax module computes features
and pred maps; the pure ``loss``/``get_bboxes`` head methods are applied to
the outputs by the training/inference drivers.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax

from ...registry import DETECTORS


@DETECTORS.register_module()
class SingleStageDetector(nn.Module):
    backbone: nn.Module
    bbox_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None

    def extract_feat(self, img, train: bool = False):
        """backbone(+neck) features (reference single_stage.py:35-41)."""
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train)
        return x

    @nn.compact
    def __call__(self, img, train: bool = False):
        """img (B, H, W, 3) normalized -> tuple of raw pred maps."""
        feats = self.extract_feat(img, train)
        return self.bbox_head(feats, train)

    # convenience passthroughs (pure, no params)
    def loss(self, pred_maps, gt_bboxes, gt_labels, gt_valid):
        return self.bbox_head.loss(pred_maps, gt_bboxes, gt_labels, gt_valid)

    # subclasses tune only these; keeps the registry aliases from
    # repeating the whole test_cfg -> head-kwargs translation
    default_iou_thr = 0.65  # NMS IoU when the config omits it
    strip_test_keys = ()    # extra test_cfg keys the head must not see

    def get_bboxes(self, pred_maps, **kwargs):
        cfg = dict(self.test_cfg or {})
        nms_cfg = cfg.pop('nms', None)
        if nms_cfg is not None:
            cfg['iou_thr'] = nms_cfg.get('iou_threshold',
                                         self.default_iou_thr)
            if nms_cfg.get('type', 'nms') != 'nms':
                cfg['nms_type'] = nms_cfg['type']
            for key in ('sigma', 'min_score', 'method'):
                if key in nms_cfg:
                    cfg[key] = nms_cfg[key]
        cfg.pop('min_bbox_size', None)
        for key in self.strip_test_keys:
            cfg.pop(key, None)
        if 'nms_pre' in cfg and cfg['nms_pre'] <= 0:
            # reference nms_pre=-1 == uncapped; head treats <=0 the same
            cfg['nms_pre'] = 0
        cfg.update(kwargs)
        return self.bbox_head.get_bboxes(pred_maps, **cfg)


@DETECTORS.register_module()
class YOLOV4(SingleStageDetector):
    """Named alias, mirroring reference detector registry breadth."""


@DETECTORS.register_module()
class YOLOV5(SingleStageDetector):
    pass


@DETECTORS.register_module()
class YOLOV3(SingleStageDetector):
    """YOLOv3 (reference mmdet/models/detectors/yolo.py)."""
    default_iou_thr = 0.45


@DETECTORS.register_module()
class ATSS(SingleStageDetector):
    """ATSS detector (reference mmdet/models/detectors/atss.py)."""
    default_iou_thr = 0.6


@DETECTORS.register_module()
class GFL(ATSS):
    """GFL detector (reference mmdet/models/detectors/gfl.py)."""


@DETECTORS.register_module()
class FCOS(SingleStageDetector):
    """Anchor-free FCOS (reference mmdet/models/detectors/fcos.py)."""
    default_iou_thr = 0.5


@DETECTORS.register_module()
class VFNet(SingleStageDetector):
    """VarifocalNet (reference mmdet/models/detectors/vfnet.py)."""
    default_iou_thr = 0.6


@DETECTORS.register_module()
class RepPointsDetector(SingleStageDetector):
    """RepPoints (reference mmdet/models/detectors/reppoints_detector.py)."""
    default_iou_thr = 0.5


@DETECTORS.register_module()
class CornerNet(SingleStageDetector):
    """CornerNet (reference mmdet/models/detectors/cornernet.py);
    keypoint-pair decoding + soft-NMS, no anchor machinery."""
    default_iou_thr = 0.5
    strip_test_keys = ('nms_pre',)


@DETECTORS.register_module()
class DETR(SingleStageDetector):
    """DETR set-prediction detector (reference
    mmdet/models/detectors/detr.py); no neck, no NMS."""
    strip_test_keys = ('nms_pre', 'score_thr', 'iou_thr', 'nms_type',
                       'sigma', 'min_score', 'method')


@DETECTORS.register_module()
class FSAF(SingleStageDetector):
    """FSAF (reference mmdet/models/detectors/fsaf.py)."""
    default_iou_thr = 0.5


@DETECTORS.register_module()
class FOVEA(SingleStageDetector):
    """FoveaBox (reference mmdet/models/detectors/fovea.py)."""
    default_iou_thr = 0.5


@DETECTORS.register_module()
class YOLOF(SingleStageDetector):
    """Single-level YOLOF (reference mmdet/models/detectors/yolof.py)."""
    default_iou_thr = 0.6


@DETECTORS.register_module()
class RetinaNet(SingleStageDetector):
    """Generic anchor path (reference mmdet/models/detectors/retinanet.py)."""
    default_iou_thr = 0.5
