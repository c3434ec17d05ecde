# GHM loss (reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py):
# RetinaNet with gradient-harmonized classification.
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(bbox_head=dict(use_ghm=True))
