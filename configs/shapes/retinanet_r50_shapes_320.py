# RetinaNet R-50-FPN on the synthetic shapes set at 320px with soft-NMS
# test-time post-processing — trained weight set for the RetinaNet leg
# of the two-stack mAP A/B (tools/map_parity.py --model retinanet
# --checkpoint ...). Soft-NMS precedent:
# configs/retinanet/retinanet_r50_fpn_softnms_1x_coco.py.
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    bbox_head=dict(num_classes=3),
    test_cfg=dict(
        nms=dict(type='soft_nms', iou_threshold=0.3, min_score=0.05,
                 method='linear')))

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375],
    to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(320, 320), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(320, 320),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Pad', size_divisor=32),
            dict(type='Normalize', **img_norm_cfg),
        ]),
]

data_root = 'data/shapes/'
classes = ('rect', 'circle', 'triangle')
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=0,
    train_img_size=320,
    max_gts=32,
    train=dict(ann_file=data_root + 'train.json',
               img_prefix=data_root + 'train/images/',
               classes=classes, pipeline=train_pipeline),
    val=dict(ann_file=data_root + 'val.json',
             img_prefix=data_root + 'val/images/',
             classes=classes, pipeline=test_pipeline, test_mode=True),
    test=dict(ann_file=data_root + 'val.json',
              img_prefix=data_root + 'val/images/',
              classes=classes, pipeline=test_pipeline, test_mode=True))

nominal_batch_size = 8
optimizer = dict(lr=0.002)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
custom_hooks = [
    dict(type='DetailedLinearWarmUpHook', warmup_iters=50,
         lr_weight_warmup_ratio=0.001, lr_bias_warmup_ratio=0.001,
         momentum_warmup_ratio=1.0),
]
runner = dict(max_epochs=100)
evaluation = dict(interval=25, metric='fast-bbox')
checkpoint_config = dict(interval=25)
log_config = dict(interval=10)
