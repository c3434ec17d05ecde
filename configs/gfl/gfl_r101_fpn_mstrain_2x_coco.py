# GFL R-101 2x multi-scale (reference configs/gfl/
# gfl_r101_fpn_mstrain_2x_coco.py) — the LD teacher model.
_base_ = 'gfl_r50_fpn_1x_coco.py'

model = dict(backbone=dict(depth=101))

lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
