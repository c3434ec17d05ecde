_base_ = 'yolov4s_coco_mosaic.py'

model = dict(
    backbone=dict(scale='v4m5p'),
    neck=dict(
        in_channels=[192, 384, 384],
        out_channels=[192, 384, 768],
        csp_repetition=1),
    bbox_head=dict(in_channels=[192, 384, 768]),
)

data = dict(samples_per_gpu=24)
