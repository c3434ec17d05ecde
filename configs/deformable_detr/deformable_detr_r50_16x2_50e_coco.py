# Deformable DETR (reference configs/deformable_detr/
# deformable_detr_r50_16x2_50e_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='DeformableDETR',
    backbone=dict(type='ResNet', depth=50, out_indices=[1, 2, 3]),
    neck=None,
    bbox_head=dict(
        _delete_=True,
        type='DeformableDETRHead',
        num_classes=80,
        in_channels=[512, 1024, 2048],
        embed_dims=256,
        num_query=300,
        num_heads=8,
        num_encoder_layers=6,
        num_decoder_layers=6,
        ffn_dim=1024),
    test_cfg=dict(_delete_=True, max_per_img=100),
)
optimizer = dict(type='AdamW', lr=2e-4, weight_decay=1e-4)
runner = dict(type='EpochBasedRunner', max_epochs=50)
lr_config = dict(policy='step', step=[40], gamma=0.1)
