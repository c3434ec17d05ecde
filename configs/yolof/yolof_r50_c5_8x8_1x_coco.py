# YOLOF R-50-C5 1x on COCO (reference configs/yolof/yolof_r50_c5_8x8_1x_coco.py):
# single-level C5 feature through a DilatedEncoder, uniform matching.

model = dict(
    type='YOLOF',
    backbone=dict(type='ResNet', depth=50, out_indices=[3]),
    neck=dict(
        type='DilatedEncoder',
        in_channels=2048,
        out_channels=512,
        block_mid_channels=128,
        num_residual_blocks=4),
    bbox_head=dict(
        type='YOLOFHead',
        num_classes=80,
        in_channels=512,
        num_cls_convs=2,
        num_reg_convs=4,
        stride=32,
        anchor_scales=[1, 2, 4, 8, 16],
        match_times=4,
        pos_ignore_thr=0.15,
        neg_ignore_thr=0.7),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        nms=dict(type='nms', iou_threshold=0.6),
        max_per_img=100),
)

dataset_type = 'CocoDataset'
data_root = 'data/coco/'
img_norm_cfg = dict(
    mean=[103.53, 116.28, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(1333, 800),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Pad', size_divisor=32),
            dict(type='Normalize', **img_norm_cfg),
        ]),
]
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=8,
    train_img_size=1344,
    max_gts=120,
    train=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/instances_train2017.json',
        img_prefix=data_root + 'train2017/',
        pipeline=train_pipeline),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/instances_val2017.json',
        img_prefix=data_root + 'val2017/',
        pipeline=test_pipeline,
        test_mode=True),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/instances_val2017.json',
        img_prefix=data_root + 'val2017/',
        pipeline=test_pipeline,
        test_mode=True))

# reference: SGD lr=0.12, bias lr mult x2 via paramwise, warmup 1500 iters
optimizer = dict(type='SGD', lr=0.12, momentum=0.9, weight_decay=0.0001,
                 nesterov=False)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='Step', step=[8, 11])
custom_hooks = [
    dict(type='DetailedLinearWarmUpHook', warmup_iters=1500,
         lr_weight_warmup_ratio=0.00066667,
         lr_bias_warmup_ratio=0.00066667,
         momentum_warmup_ratio=1.0),
]
runner = dict(type='EpochBasedRunner', max_epochs=12)
evaluation = dict(interval=1, metric='fast-bbox')
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
seed = 0
