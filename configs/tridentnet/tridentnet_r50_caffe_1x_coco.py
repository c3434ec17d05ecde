# TridentNet (reference configs/tridentnet/tridentnet_r50_caffe_1x_coco).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='TridentFasterRCNN',
    backbone=dict(_delete_=True, type='TridentResNet', depth=50,
                  num_branch=3, test_branch_idx=1),
    neck=None,
    rpn_head=dict(in_channels=1024, feat_channels=256, strides=[16]),
    roi_head=dict(_delete_=True, type='TridentRoIHead', num_classes=80,
                  in_channels=1024, featmap_strides=[16]),
)
