from .single_stage import SingleStageDetector, YOLOV4, YOLOV5
from .two_stage import TwoStageDetector, FasterRCNN
from .rpn import RPN, FastRCNN

__all__ = ['SingleStageDetector', 'YOLOV4', 'YOLOV5', 'TwoStageDetector',
           'FasterRCNN', 'RPN', 'FastRCNN']
