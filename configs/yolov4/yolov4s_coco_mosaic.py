# YOLOv4-s on COCO with Mosaic training.
# Mirrors reference configs/yolov4/yolov4s_coco_mosaic.py, adapted to the
# tpudet arg surface (anchors/strides are YOLOCSPHead defaults).

model = dict(
    type='SingleStageDetector',
    backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
    neck=dict(
        type='YOLOV4Neck',
        in_channels=[128, 256, 256],
        out_channels=[128, 256, 512],
        csp_repetition=1),
    bbox_head=dict(
        type='YOLOCSPHead', num_classes=80, in_channels=[128, 256, 512]),
    train_cfg=dict(),
    test_cfg=dict(
        min_bbox_size=0,
        # Candidate budgets for the padded TPU NMS. The reference runs
        # uncapped (nms_pre=-1, yolov4l_coco_mosaic.py:14-15); tpudet's
        # shipped default is the COMPOSITE budget: a sort-free lane-local
        # preselection (lane_pre: top-4 of every 128-lane column,
        # core/nms.py::lane_topk_select) feeding an exact per-class
        # top-class_pre slice (core/nms.py::class_lane_nms). The NMS
        # stage drops 24.5 -> 12.4 ms at yolov4l-640 batch 128 vs the
        # per-class payload sort alone. A candidate is only lost if 4
        # same-lane OR 256 same-class higher-scored candidates outrank
        # it; measured 0 missing detections vs the exact uncapped path
        # on realistic + adversarial distributions
        # (tools/nms_budget_ablation.py ->
        # docs/nms_budget_ablation.json, anchor2048_lane4_class256).
        # Exact uncapped semantics remain available via lane_pre=0,
        # class_pre=0, nms_pre=-1 (core/nms.py::dense_class_nms).
        anchor_pre=2048,
        nms_pre=-1,
        lane_pre=4,
        class_pre=256,
        score_thr=0.001,
        nms=dict(type='nms', iou_threshold=0.65),
        max_per_img=300),
)

dataset_type = 'CocoDataset'
data_root = 'data/coco/'
img_norm_cfg = dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)
train_pipeline = [
    dict(
        type='MosaicPipeline',
        individual_pipeline=[
            dict(type='LoadImageFromFile', im_decode_backend='turbojpeg'),
            dict(type='LoadAnnotations', with_bbox=True),
            dict(type='Resize', img_scale=(640, 640), keep_ratio=True),
        ],
        pad_val=114),
    dict(type='RandomAffineChain', pad_to=1920, crop=1280, scale_limit=0.5,
         out=640, hflip_p=0.5, pad_val=114, min_area=4, min_visibility=0.2),
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
        img_scale=(640, 640),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='RandomFlip'),
            dict(type='Pad', size_divisor=32),
            dict(type='Normalize', **img_norm_cfg),
        ]),
]

data = dict(
    samples_per_gpu=32,
    workers_per_gpu=6,
    train_img_size=640,
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

nominal_batch_size = 64

optimizer = dict(
    type='SGD',
    lr=0.01,
    momentum=0.937,
    weight_decay=0.0005,
    nesterov=True,
    paramwise_cfg=dict(bias_decay_mult=0., norm_decay_mult=0.))

optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))

lr_config = dict(policy='CosineAnnealing', min_lr_ratio=0.2)

custom_hooks = [
    dict(
        type='DetailedLinearWarmUpHook',
        warmup_iters=10000,
        lr_weight_warmup_ratio=0.,
        lr_bias_warmup_ratio=10.,
        momentum_warmup_ratio=0.95),
    dict(
        type='StateEMAHook',
        momentum=0.9999,
        nominal_batch_size=nominal_batch_size,
        warm_up=10000),
]

runner = dict(type='EpochBasedRunner', max_epochs=300)
evaluation = dict(interval=1, metric='fast-bbox')
checkpoint_config = dict(interval=5)
log_config = dict(interval=50)
seed = 0
