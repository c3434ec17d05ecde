# SABL Faster R-CNN (reference configs/sabl/sabl_faster_rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    roi_head=dict(_delete_=True, type='SABLRoIHead', num_classes=80,
                  in_channels=256, num_buckets=14, scale_factor=1.7),
)
