# RetinaNet R-50-FPN 1x with soft-NMS post-processing — the reference
# reaches this by swapping the test_cfg nms dict to
# ``nms=dict(type='soft_nms')``, dispatched inside mmcv ``batched_nms``
# (reference mmdet/core/post_processing/bbox_nms.py:84; soft-NMS config
# precedent: configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py).
_base_ = './retinanet_r50_fpn_1x_coco.py'

model = dict(
    test_cfg=dict(
        nms=dict(type='soft_nms', iou_threshold=0.3, min_score=0.05,
                 method='linear')))
