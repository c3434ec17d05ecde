# YOLOv4-s on the synthetic 3-class shapes set at 320px — the committed
# recipe behind docs/train_runs/yolov4s_tpu_1600step.log and the
# trained-weights two-stack mAP A/B (tools/map_parity.py --checkpoint).
#
# Generate the dataset first:
#   python tools/misc/synth_shapes.py data/shapes --train 64 --val 32 --size 320
#
# space_to_depth_stem=False keeps the stem layer-for-layer convertible to
# the reference torch DarknetCSP (tpudet/utils/weight_convert.py) so one
# trained weight set can run through BOTH stacks' eval flows.
_base_ = '../yolov4/yolov4s_coco_mosaic.py'

model = dict(
    backbone=dict(scale='v4s5p', space_to_depth_stem=False),
    bbox_head=dict(num_classes=3))

img_norm_cfg = dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)
train_pipeline = [
    dict(
        type='MosaicPipeline',
        individual_pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', with_bbox=True),
            dict(type='Resize', img_scale=(320, 320), keep_ratio=True),
        ],
        pad_val=114),
    dict(type='RandomAffineChain', pad_to=960, crop=640, scale_limit=0.5,
         out=320, hflip_p=0.5, pad_val=114, min_area=4, min_visibility=0.2),
    dict(
        type='HueSaturationValueJitter',
        hue_ratio=0.015,
        saturation_ratio=0.7,
        value_ratio=0.4),
    dict(type='GtBBoxesFilter', min_size=2, max_aspect_ratio=20),
    dict(type='Normalize', **img_norm_cfg),
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
optimizer = dict(lr=0.004)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))

custom_hooks = [
    dict(
        type='DetailedLinearWarmUpHook',
        warmup_iters=50,
        lr_weight_warmup_ratio=0.,
        lr_bias_warmup_ratio=10.,
        momentum_warmup_ratio=0.95),
    dict(
        type='StateEMAHook',
        momentum=0.999,
        nominal_batch_size=nominal_batch_size,
        warm_up=400),
]

runner = dict(max_epochs=200)
evaluation = dict(interval=50, metric='fast-bbox')
checkpoint_config = dict(interval=50)
log_config = dict(interval=10)
