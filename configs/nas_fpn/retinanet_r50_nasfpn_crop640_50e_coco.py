# RetinaNet + NAS-FPN + per-level-BN head (reference configs/nas_fpn/
# retinanet_r50_nasfpn_crop640_50e_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    neck=dict(_delete_=True, type='NASFPN',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              stack_times=7, num_outs=5),
    bbox_head=dict(_delete_=True, type='RetinaSepBNHead', num_classes=80,
                   num_ins=5, in_channels=256, feat_channels=256,
                   stacked_convs=4),
)
runner = dict(type='EpochBasedRunner', max_epochs=50)
