# SSD300 (reference configs/ssd/ssd300_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    _delete_=True,
    type='SSD',
    backbone=dict(type='SSDVGG', input_size=300),
    bbox_head=dict(type='SSDHead', num_classes=80, input_size=300),
    test_cfg=dict(nms_pre=1000, score_thr=0.02,
                  nms=dict(iou_threshold=0.45), max_per_img=200),
)
data = dict(train_img_size=300)
