# VarifocalNet R-50-FPN 1x (reference configs/vfnet/vfnet_r50_fpn_1x_coco.py).

_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='VFNet',
    neck=dict(start_level=1, add_extra_convs='on_output',
              relu_before_extra_convs=True),
    bbox_head=dict(
        _delete_=True,
        type='VFNetHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        stacked_convs=3,
        strides=[8, 16, 32, 64, 128],
        gradient_mul=0.1,
        atss_topk=9,
        vfl_alpha=0.75,
        vfl_gamma=2.0,
        loss_bbox_weight=1.5,
        loss_refine_weight=2.0),
    train_cfg=dict(
        _delete_=True,
        assigner=dict(type='ATSSAssigner', topk=9)),
    test_cfg=dict(
        nms_pre=1000,
        score_thr=0.05,
        nms=dict(type='nms', iou_threshold=0.6),
        max_per_img=100),
)

optimizer = dict(lr=0.01, momentum=0.9, weight_decay=0.0001)
