# YOLOv3 DarkNet-53 608 (reference configs/yolo/
# yolov3_d53_mstrain-608_273e_coco.py — the config with published numbers:
# 33.4 AP @ 608, BASELINE.md).

model = dict(
    type='YOLOV3',
    backbone=dict(type='Darknet', depth=53, out_indices=[3, 4, 5]),
    neck=dict(
        type='YOLOV3Neck',
        num_scales=3,
        in_channels=[1024, 512, 256],
        out_channels=[512, 256, 128]),
    bbox_head=dict(
        type='YOLOV3Head',
        num_classes=80,
        in_channels=[512, 256, 128],
        out_channels=[1024, 512, 256]),
    train_cfg=dict(
        assigner=dict(type='GridAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0)),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        conf_thr=0.005,
        nms=dict(type='nms', iou_threshold=0.45),
        max_per_img=100),
)

dataset_type = 'CocoDataset'
data_root = 'data/coco/'
img_norm_cfg = dict(mean=[0, 0, 0], std=[255., 255., 255.], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(608, 608), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='HueSaturationValueJitter', hue_ratio=0.015,
         saturation_ratio=0.7, value_ratio=0.4),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(608, 608),
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
    workers_per_gpu=4,
    train_img_size=608,
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

optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0005,
                 nesterov=False)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='CosineAnnealing', min_lr_ratio=0.1)
custom_hooks = [
    dict(type='DetailedLinearWarmUpHook', warmup_iters=2000,
         lr_weight_warmup_ratio=0.1, lr_bias_warmup_ratio=0.1,
         momentum_warmup_ratio=1.0),
]
runner = dict(type='EpochBasedRunner', max_epochs=273)
evaluation = dict(interval=7, metric='fast-bbox')
checkpoint_config = dict(interval=7)
log_config = dict(interval=50)
seed = 0
