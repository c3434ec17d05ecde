# LD distillation (reference configs/ld/ld_r18_gflv1_r101_fpn_coco_1x).
_base_ = '../gfl/gfl_r50_fpn_1x_coco.py'
model = dict(
    type='KnowledgeDistillationSingleStageDetector',
    backbone=dict(depth=18),
    neck=dict(in_channels=[64, 128, 256, 512]),
    bbox_head=dict(type='LDHead', num_classes=80, in_channels=256),
)
