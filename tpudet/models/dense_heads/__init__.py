from .yolocsp_head import YOLOCSPHead
from .retina_head import RetinaHead

__all__ = ['YOLOCSPHead', 'RetinaHead']
