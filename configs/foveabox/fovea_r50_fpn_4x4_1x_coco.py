# FoveaBox R-50-FPN 1x on COCO
# (reference configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py).

model = dict(
    type='FOVEA',
    backbone=dict(type='ResNet', depth=50, out_indices=[0, 1, 2, 3]),
    neck=dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs='on_input',
        num_outs=5),
    bbox_head=dict(
        type='FoveaHead',
        num_classes=80,
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        base_edge_list=[16, 32, 64, 128, 256],
        # the published recipe's ranges + losses (reference
        # configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py:33-43), which
        # override the FoveaHead class defaults
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                      (256, 2048)),
        sigma=0.4,
        focal_gamma=1.5,
        focal_alpha=0.4,
        smooth_l1_beta=0.11,
        loss_bbox_weight=0.75),
    test_cfg=dict(
        nms_pre=1000,
        score_thr=0.05,
        nms=dict(type='nms', iou_threshold=0.5),
        max_per_img=100),
)

dataset_type = 'CocoDataset'
data_root = 'data/coco/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
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
    samples_per_gpu=4,
    workers_per_gpu=4,
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

optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001,
                 nesterov=False)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='Step', step=[8, 11])
custom_hooks = [
    dict(type='DetailedLinearWarmUpHook', warmup_iters=500,
         lr_weight_warmup_ratio=0.001, lr_bias_warmup_ratio=0.001,
         momentum_warmup_ratio=1.0),
]
runner = dict(type='EpochBasedRunner', max_epochs=12)
evaluation = dict(interval=1, metric='fast-bbox')
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
seed = 0
