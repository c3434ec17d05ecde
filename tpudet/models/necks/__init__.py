from .yolo_neck_csp import YOLOV4Neck, YOLOV5Neck
from .fpn import FPN
from .yolo_neck import YOLOV3Neck

__all__ = ['YOLOV4Neck', 'YOLOV5Neck', 'FPN', 'YOLOV3Neck']
