# SABL RetinaNet (reference configs/sabl/sabl_retinanet_r50_fpn_1x).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='SABLRetinaNet',
    bbox_head=dict(_delete_=True, type='SABLRetinaHead', num_classes=80,
                   in_channels=256, feat_channels=256, stacked_convs=4),
)
