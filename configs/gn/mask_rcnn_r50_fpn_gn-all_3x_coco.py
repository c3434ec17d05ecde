# reference configs/gn/mask_rcnn_r50_fpn_gn-all_3x_coco.py
_base_ = './mask_rcnn_r50_fpn_gn-all_2x_coco.py'
lr_config = dict(policy='step', step=[28, 34], gamma=0.1)
runner = dict(max_epochs=36)
