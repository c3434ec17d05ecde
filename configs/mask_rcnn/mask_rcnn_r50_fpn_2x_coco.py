# reference configs/mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py
_base_ = './mask_rcnn_r50_fpn_1x_coco.py'
lr_config = dict(policy='step', step=[16, 22], gamma=0.1)
runner = dict(max_epochs=24)
