# Cascade R-CNN (reference configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='CascadeRCNN',
    roi_head=dict(_delete_=True, type='CascadeRoIHead', num_classes=80,
                  in_channels=256),
)
