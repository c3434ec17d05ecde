from .yolocsp_head import YOLOCSPHead
from .retina_head import RetinaHead
from .yolov3_head import YOLOV3Head
from .fcos_head import FCOSHead
from .ssd_head import SSDHead, SSD
from .rpn_head import RPNHead
from .atss_head import ATSSHead
from .gfl_head import GFLHead
from .yolof_head import YOLOFHead
from .fovea_head import FoveaHead
from .fsaf_head import FSAFHead
from .free_anchor_retina_head import FreeAnchorRetinaHead
from .detr_head import DETRHead
from .corner_head import CornerHead
from .reppoints_head import RepPointsHead
from .vfnet_head import VFNetHead
from .yolact_head import YOLACTHead, YOLACTProtonet, YOLACTSegmHead, YOLACT
from .pisa_heads import PISARetinaHead, PISASSDHead, PISARetinaNet
from .ld_head import LDHead, KnowledgeDistillationSingleStageDetector
from .paa_head import PAAHead, PAA
from .autoassign_head import AutoAssignHead, AutoAssign
from .sabl_retina_head import SABLRetinaHead, SABLRetinaNet
from .retina_sepbn_head import RetinaSepBNHead
from .guided_anchor_head import (FeatureAdaption, GARetinaHead, GARPNHead,
                                 GARetinaNet)
from .nasfcos_head import NASFCOSHead, NASFCOS
from .cascade_rpn_head import CascadeRPNHead, StageCascadeRPN
from .centripetal_head import CentripetalHead, CentripetalNet
from .deformable_detr_head import (DeformableDETRHead, DeformableDETR,
                                   MSDeformAttention)

__all__ = [
    'RetinaSepBNHead', 'FeatureAdaption', 'GARetinaHead', 'GARPNHead',
    'GARetinaNet', 'NASFCOSHead', 'NASFCOS', 'CascadeRPNHead', 'StageCascadeRPN', 'CentripetalHead', 'CentripetalNet', 'DeformableDETRHead',
    'DeformableDETR', 'MSDeformAttention',
    'YOLOCSPHead', 'RetinaHead', 'YOLOV3Head', 'FCOSHead', 'SSDHead', 'SSD',
    'RPNHead', 'ATSSHead', 'GFLHead', 'YOLOFHead', 'FoveaHead', 'FSAFHead',
    'FreeAnchorRetinaHead', 'DETRHead', 'CornerHead', 'RepPointsHead',
    'VFNetHead', 'YOLACTHead', 'YOLACTProtonet', 'YOLACTSegmHead', 'YOLACT',
    'PISARetinaHead', 'PISASSDHead', 'PISARetinaNet', 'LDHead',
    'KnowledgeDistillationSingleStageDetector', 'PAAHead', 'PAA', 'AutoAssignHead', 'AutoAssign', 'SABLRetinaHead', 'SABLRetinaNet'
]
