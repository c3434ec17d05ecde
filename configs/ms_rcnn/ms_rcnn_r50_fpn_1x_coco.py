# Mask Scoring R-CNN (reference configs/ms_rcnn/ms_rcnn_r50_caffe_fpn_1x).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='MaskScoringRCNN',
    roi_head=dict(_delete_=True, type='MaskScoringRoIHead', num_classes=80,
                  in_channels=256),
)
