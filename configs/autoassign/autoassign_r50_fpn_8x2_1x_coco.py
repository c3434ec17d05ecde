# AutoAssign (reference configs/autoassign/autoassign_r50_fpn_8x2_1x).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='AutoAssign',
    bbox_head=dict(_delete_=True, type='AutoAssignHead', num_classes=80,
                   in_channels=256, feat_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.6), max_per_img=100),
)
