# GA-RetinaNet (reference configs/guided_anchoring/
# ga_retinanet_r50_fpn_1x_coco.py). Loc/shape/ga-assigner knobs are head
# fields in tpudet.
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='GARetinaNet',
    bbox_head=dict(
        _delete_=True,
        type='GARetinaHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        octave_base_scale=4,
        scales_per_octave=3,
        ratios=[0.5, 1.0, 2.0],
        loc_filter_thr=0.01,
        center_ratio=0.2,
        ignore_ratio=0.5,
        loss_bbox_beta=0.04),
)
