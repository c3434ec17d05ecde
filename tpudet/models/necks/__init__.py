from .yolo_neck_csp import YOLOV4Neck, YOLOV5Neck
from .fpn import FPN

__all__ = ['YOLOV4Neck', 'YOLOV5Neck', 'FPN']
