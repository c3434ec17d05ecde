# DETR (reference configs/detr/detr_r50_8x2_150e_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='DETR',
    backbone=dict(type='ResNet', depth=50, out_indices=[3]),
    neck=None,
    bbox_head=dict(_delete_=True, type='DETRHead', num_classes=80,
                   in_channels=2048, num_query=100),
    test_cfg=dict(_delete_=True, max_per_img=100),
)
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=1e-4)
runner = dict(type='EpochBasedRunner', max_epochs=150)
