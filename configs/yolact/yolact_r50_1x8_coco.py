# YOLACT (reference configs/yolact/yolact_r50_1x8_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='YOLACT',
    backbone=dict(type='ResNet', depth=50, out_indices=[1, 2, 3]),
    neck=dict(in_channels=[512, 1024, 2048], start_level=0,
              num_outs=5),
    bbox_head=dict(_delete_=True, type='YOLACTHead', num_classes=80,
                   in_channels=256, num_protos=32),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  iou_thr=0.5, max_per_img=100),
)
