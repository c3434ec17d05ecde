# FCOS (reference configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='FCOS',
    bbox_head=dict(_delete_=True, type='FCOSHead', num_classes=80,
                   in_channels=256, feat_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.5), max_per_img=100),
)
