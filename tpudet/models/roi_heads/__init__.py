from .bbox_head import Shared2FCBBoxHead, Shared4Conv1FCBBoxHead
from .standard_roi_head import StandardRoIHead
from .mask_head import FCNMaskHead, MaskRoIHead, MaskRCNN
from .cascade_roi_head import CascadeRoIHead, CascadeRCNN
from .double_roi_head import DoubleHeadRoIHead, DoubleHeadRCNN
from .mask_scoring_roi_head import MaskScoringRoIHead, MaskScoringRCNN
from .dynamic_roi_head import DynamicRoIHead, DynamicRCNN
from .trident_roi_head import TridentRoIHead, TridentFasterRCNN
from .htc_roi_head import HTCRoIHead, HybridTaskCascade, FusedSemanticHead
from .sparse_roi_head import (SparseRoIHead, SparseRCNN, EmbeddingRPNHead,
                              DIIHead)
from .pisa_roi_head import PISARoIHead, PISAFasterRCNN
from .grid_roi_head import GridHead, GridRoIHead, GridRCNN
from .point_rend_roi_head import (CoarseMaskHead, MaskPointHead,
                                  PointRendRoIHead, PointRend)
from .scnet_roi_head import (SCNetRoIHead, SCNet, GlobalContextHead,
                             SCNetMaskHead, SCNetBBoxHead)
from .sabl_roi_head import SABLRoIHead, SABLBBoxHead, SABLFasterRCNN
from .res_layer_head import C4RoIHead, ResLayerSharedHead, FasterRCNNC4

__all__ = [
    'Shared2FCBBoxHead', 'Shared4Conv1FCBBoxHead', 'SABLRoIHead',
    'SABLBBoxHead', 'SABLFasterRCNN', 'C4RoIHead',
    'ResLayerSharedHead', 'FasterRCNNC4', 'StandardRoIHead', 'FCNMaskHead', 'MaskRoIHead',
    'MaskRCNN', 'CascadeRoIHead', 'CascadeRCNN', 'DoubleHeadRoIHead',
    'DoubleHeadRCNN', 'MaskScoringRoIHead', 'MaskScoringRCNN',
    'DynamicRoIHead', 'DynamicRCNN', 'TridentRoIHead', 'TridentFasterRCNN',
    'HTCRoIHead', 'HybridTaskCascade', 'FusedSemanticHead', 'SparseRoIHead',
    'SparseRCNN', 'EmbeddingRPNHead', 'DIIHead', 'PISARoIHead',
    'PISAFasterRCNN', 'GridHead', 'GridRoIHead', 'GridRCNN',
    'CoarseMaskHead', 'MaskPointHead', 'PointRendRoIHead', 'PointRend',
    'SCNetRoIHead', 'SCNet', 'GlobalContextHead', 'SCNetMaskHead',
    'SCNetBBoxHead'
]
