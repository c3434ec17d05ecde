from .anchors import (AnchorGenerator, YOLOAnchorGenerator,
                      YOLOV4AnchorGenerator, build_anchor_generator)
from .bbox import (YOLOV4BBoxCoder, DeltaXYWHBBoxCoder, build_bbox_coder,
                   bbox_overlaps, bbox_overlaps_aligned)
from .nms import batched_nms, multiclass_nms
from .targets import responsible_matches

__all__ = [
    'AnchorGenerator', 'YOLOAnchorGenerator', 'YOLOV4AnchorGenerator',
    'build_anchor_generator', 'YOLOV4BBoxCoder', 'DeltaXYWHBBoxCoder',
    'build_bbox_coder', 'bbox_overlaps', 'bbox_overlaps_aligned',
    'batched_nms', 'multiclass_nms', 'responsible_matches'
]
