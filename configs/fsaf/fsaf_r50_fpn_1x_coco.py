# FSAF R-50-FPN 1x on COCO (reference configs/fsaf/fsaf_r50_fpn_1x_coco.py):
# anchor-free RetinaNet branch with online level selection.

_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='FSAF',
    bbox_head=dict(
        _delete_=True,
        type='FSAFHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        pos_scale=0.2,
        neg_scale=0.2,
        normalizer=4.0),
    train_cfg=dict(
        _delete_=True,
        assigner=dict(type='CenterRegionAssigner', pos_scale=0.2,
                      neg_scale=0.2, min_pos_iof=0.01)),
)

optimizer_config = dict(
    _delete_=True, grad_clip=dict(max_norm=10, norm_type=2))
