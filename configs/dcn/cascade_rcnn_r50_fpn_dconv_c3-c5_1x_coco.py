# reference configs/dcn/cascade_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py
_base_ = '../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py'
model = dict(backbone=dict(stage_with_dcn=[False, True, True, True]))
