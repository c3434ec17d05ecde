from .mean_ap import (average_precision, iou_coco, match_coco,
                      match_best_only,
                      eval_map_flexible, FlexibleStatisticsEval,
                      NoBreakdown, ScaleBreakdown, coco_fast_bbox_eval)

__all__ = [
    'average_precision', 'iou_coco', 'match_coco', 'match_best_only',
    'eval_map_flexible',
    'FlexibleStatisticsEval', 'NoBreakdown', 'ScaleBreakdown',
    'coco_fast_bbox_eval'
]
