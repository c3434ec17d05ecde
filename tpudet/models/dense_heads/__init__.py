from .yolocsp_head import YOLOCSPHead
from .retina_head import RetinaHead
from .yolov3_head import YOLOV3Head
from .fcos_head import FCOSHead
from .ssd_head import SSDHead, SSD
from .rpn_head import RPNHead
from .atss_head import ATSSHead
from .gfl_head import GFLHead

__all__ = ['YOLOCSPHead', 'RetinaHead', 'YOLOV3Head', 'FCOSHead', 'SSDHead', 'SSD', 'RPNHead', 'ATSSHead', 'GFLHead']
