from .bbox_head import Shared2FCBBoxHead
from .standard_roi_head import StandardRoIHead
from .mask_head import FCNMaskHead, MaskRoIHead, MaskRCNN
from .cascade_roi_head import CascadeRoIHead, CascadeRCNN

__all__ = ['Shared2FCBBoxHead', 'StandardRoIHead', 'FCNMaskHead',
           'MaskRoIHead', 'MaskRCNN', 'CascadeRoIHead', 'CascadeRCNN']
