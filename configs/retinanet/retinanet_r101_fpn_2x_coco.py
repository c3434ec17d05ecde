# reference configs/retinanet/retinanet_r101_fpn_2x_coco.py
# (schedule_2x: 24 epochs, step decay at [16, 22])
_base_ = './retinanet_r101_fpn_1x_coco.py'
lr_config = dict(policy='step', step=[16, 22], gamma=0.1)
runner = dict(max_epochs=24)
