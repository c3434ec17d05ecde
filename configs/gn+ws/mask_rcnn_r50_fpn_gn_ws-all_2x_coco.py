# (reference configs/gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(norm='GN', gn_groups=32, conv_ws=True),
    neck=dict(norm='GN', gn_groups=32),
    roi_head=dict(bbox_head_type='Shared4Conv1FCBBoxHead', norm='GN',
                  conv_ws=True),
)
