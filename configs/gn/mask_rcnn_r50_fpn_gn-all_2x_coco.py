# Mask R-CNN R-50-FPN with GroupNorm everywhere
# (reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py:
#  norm_cfg GN/32 on backbone + neck + 4conv1fc bbox head).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(norm='GN', gn_groups=32),
    neck=dict(norm='GN', gn_groups=32),
    roi_head=dict(bbox_head_type='Shared4Conv1FCBBoxHead', norm='GN'),
)
