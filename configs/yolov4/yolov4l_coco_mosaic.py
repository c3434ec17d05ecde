_base_ = 'yolov4s_coco_mosaic.py'

model = dict(
    backbone=dict(scale='v4l5p'),
    neck=dict(
        in_channels=[256, 512, 512],
        out_channels=[256, 512, 1024],
        csp_repetition=2),
    bbox_head=dict(in_channels=[256, 512, 1024]),
)

data = dict(samples_per_gpu=12)
