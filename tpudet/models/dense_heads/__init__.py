from .yolocsp_head import YOLOCSPHead
from .retina_head import RetinaHead
from .yolov3_head import YOLOV3Head

__all__ = ['YOLOCSPHead', 'RetinaHead', 'YOLOV3Head']
