from .layers import ConvModule, get_activation
from .builder import build_detector, build_backbone, build_neck, build_head
from .backbones import DarknetCSP
from .necks import YOLOV4Neck, YOLOV5Neck
from .dense_heads import YOLOCSPHead
from .detectors import SingleStageDetector, YOLOV4, YOLOV5
from . import roi_heads  # noqa: F401

__all__ = [
    'ConvModule', 'get_activation', 'build_detector', 'build_backbone',
    'build_neck', 'build_head', 'DarknetCSP', 'YOLOV4Neck', 'YOLOV5Neck',
    'YOLOCSPHead', 'SingleStageDetector', 'YOLOV4', 'YOLOV5'
]
