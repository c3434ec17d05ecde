# HTC (reference configs/htc/htc_r50_fpn_1x_coco.py).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='HybridTaskCascade',
    roi_head=dict(_delete_=True, type='HTCRoIHead', num_classes=80,
                  in_channels=256, num_semantic_classes=183),
)
