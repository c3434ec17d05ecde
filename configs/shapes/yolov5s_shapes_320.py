# YOLOv5-s on the synthetic shapes set — trained weight set for the
# YOLOv5 leg of the two-stack mAP A/B (tools/map_parity.py --model
# yolov5s --checkpoint ...). See yolov4s_shapes_320.py for the recipe.
_base_ = './yolov4s_shapes_320.py'

model = dict(
    backbone=dict(scale='v5s5p', out_indices=[2, 3, 4],
                  space_to_depth_stem=False),
    neck=dict(type='YOLOV5Neck', in_channels=[128, 256, 512]),
)
