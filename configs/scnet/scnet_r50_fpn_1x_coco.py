# SCNet (reference configs/scnet/scnet_r50_fpn_1x_coco.py).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'

model = dict(
    type='SCNet',
    roi_head=dict(
        _delete_=True,
        type='SCNetRoIHead',
        num_classes=80,
        in_channels=256,
        num_semantic_classes=183,
        semantic_loss_weight=0.2,
        glbctx_loss_weight=3.0),
)
