# reference configs/gn+ws/faster_rcnn_x101_32x4d_fpn_gn_ws-all_1x_coco.py
_base_ = './faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py'
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=32,
                           base_width=4))
