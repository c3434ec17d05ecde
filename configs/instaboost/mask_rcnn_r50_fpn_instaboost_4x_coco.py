# InstaBoost augmentation for Mask R-CNN (reference configs/instaboost/
# mask_rcnn_r50_fpn_instaboost_4x_coco.py; the reference delegates to
# the `instaboostfast` package — tpudet ships a native mask-aware
# instance-jitter copy-paste, data/pipelines.py InstaBoost).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='InstaBoost', prob=0.5),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=64),
]
data = dict(train=dict(pipeline=train_pipeline))
runner = dict(max_epochs=48)
