# Mask R-CNN R-50-FPN 1x (reference configs/mask_rcnn/
# mask_rcnn_r50_fpn_1x_coco.py): Faster R-CNN + FCN mask branch; mask
# targets use the static gt-frame representation (tpudet/core/mask.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    type='MaskRCNN',
    roi_head=dict(type='MaskRoIHead', num_classes=80, in_channels=256),
)

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=64),
]
data = dict(train=dict(pipeline=train_pipeline))
