from .bbox_head import Shared2FCBBoxHead
from .standard_roi_head import StandardRoIHead
from .mask_head import FCNMaskHead, MaskRoIHead, MaskRCNN

__all__ = ['Shared2FCBBoxHead', 'StandardRoIHead', 'FCNMaskHead',
           'MaskRoIHead', 'MaskRCNN']
