# Faster R-CNN with GN + Weight Standardization
# (reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py:
#  conv_cfg ConvWS + norm_cfg GN on backbone/neck/head).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(norm='GN', gn_groups=32, conv_ws=True),
    neck=dict(norm='GN', gn_groups=32),
    roi_head=dict(bbox_head_type='Shared4Conv1FCBBoxHead', norm='GN',
                  conv_ws=True),
)
