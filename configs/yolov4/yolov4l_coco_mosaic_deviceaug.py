# YOLOv4-l with the on-device augmentation pipeline: the host only decodes
# + letterboxes tiles; mosaic + random-affine + HSV + normalize run as one
# jitted program on the TPU (tpudet/data/device_aug.py) — the TPU-native
# replacement for the reference's 6-CPU-worker Mosaic/Albu chain.
_base_ = 'yolov4l_coco_mosaic.py'

train_pipeline = [
    dict(type='LoadImageFromFile', im_decode_backend='turbojpeg'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(640, 640), keep_ratio=True),
]

data = dict(
    device_aug=dict(
        pad_to=1920, crop=1280, scale_limit=0.5, pad_val=114.,
        min_area=4., min_visibility=0.2, min_size=2., max_aspect_ratio=20.,
        hue_ratio=0.015, saturation_ratio=0.7, value_ratio=0.4),
    train=dict(pipeline=train_pipeline),
)
