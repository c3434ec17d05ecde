# reference configs/ssd/ssd512_coco.py: 512 input, 7 feature levels,
# basesize ratio range widened to (0.1, 0.9).
_base_ = './ssd300_coco.py'
model = dict(
    backbone=dict(input_size=512),
    bbox_head=dict(
        input_size=512,
        in_channels=(512, 1024, 512, 256, 256, 256, 256),
        basesize_ratio_range=(0.1, 0.9),
        strides=[8, 16, 32, 64, 128, 256, 512],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]))
