# RepPoints moment R-50-FPN 1x
# (reference configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py).

_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='RepPointsDetector',
    neck=dict(start_level=1, add_extra_convs='on_input'),
    bbox_head=dict(
        _delete_=True,
        type='RepPointsHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        point_feat_channels=256,
        stacked_convs=3,
        num_points=9,
        gradient_mul=0.1,
        point_base_scale=4,
        strides=[8, 16, 32, 64, 128],
        loss_init_weight=0.5,
        loss_refine_weight=1.0),
    train_cfg=dict(
        _delete_=True,
        init=dict(assigner=dict(type='PointAssigner', scale=4, pos_num=1)),
        refine=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                  neg_iou_thr=0.4, min_pos_iou=0))),
)
