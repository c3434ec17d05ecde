_base_ = 'yolov4s_coco_mosaic.py'

model = dict(
    backbone=dict(scale='v4x5p'),
    neck=dict(
        in_channels=[320, 640, 640],
        out_channels=[320, 640, 1280],
        csp_repetition=3),
    bbox_head=dict(in_channels=[320, 640, 1280]),
)

data = dict(samples_per_gpu=8)
