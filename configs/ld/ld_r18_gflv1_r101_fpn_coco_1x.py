# LD distillation (reference configs/ld/ld_r18_gflv1_r101_fpn_coco_1x).
_base_ = '../gfl/gfl_r50_fpn_1x_coco.py'
model = dict(
    type='KnowledgeDistillationSingleStageDetector',
    # frozen teacher built from its own config (reference
    # ld_r18_gflv1_r101_fpn_coco_1x.py:9-10); convert teacher_ckpt with
    # tools/model_converters/torch_to_jax.py
    teacher_config='configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py',
    backbone=dict(depth=18),
    neck=dict(in_channels=[64, 128, 256, 512]),
    bbox_head=dict(type='LDHead', num_classes=80, in_channels=256),
)
