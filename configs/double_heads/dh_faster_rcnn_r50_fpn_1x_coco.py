# Double-Head R-CNN (reference configs/double_heads/dh_faster_rcnn_*).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    type='DoubleHeadRCNN',
    roi_head=dict(_delete_=True, type='DoubleHeadRoIHead', num_classes=80,
                  in_channels=256),
)
