from .yolo_neck_csp import YOLOV4Neck, YOLOV5Neck
from .fpn import FPN, PAFPN
from .yolo_neck import YOLOV3Neck
from .channel_mapper import ChannelMapper, DilatedEncoder
from .hrfpn import HRFPN, BFP
from .nas_fpn import NASFPN
from .rfp import RFP, ASPP
from .nasfcos_fpn import NASFCOS_FPN, ConcatCell
from .fpn_carafe import FPN_CARAFE
from .fpg import FPG

__all__ = [
    'YOLOV4Neck', 'YOLOV5Neck', 'FPN', 'PAFPN', 'YOLOV3Neck',
    'ChannelMapper', 'DilatedEncoder', 'HRFPN', 'BFP', 'NASFPN', 'RFP',
    'ASPP', 'NASFCOS_FPN', 'ConcatCell', 'FPN_CARAFE', 'FPG'
]
