# Dynamic R-CNN (reference configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='DynamicRCNN',
    roi_head=dict(_delete_=True, type='DynamicRoIHead', num_classes=80,
                  in_channels=256),
)
