# GFL (reference configs/gfl/gfl_r50_fpn_1x_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='GFL',
    bbox_head=dict(_delete_=True, type='GFLHead', num_classes=80,
                   in_channels=256, feat_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.6), max_per_img=100),
)
