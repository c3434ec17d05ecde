# PointRend (reference configs/point_rend/point_rend_r50_caffe_fpn_*).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'

model = dict(
    type='PointRend',
    roi_head=dict(
        _delete_=True,
        type='PointRendRoIHead',
        num_classes=80,
        in_channels=256,
        num_points=196,
        oversample_ratio=3,
        importance_sample_ratio=0.75,
        subdivision_steps=5,
        subdivision_num_points=784,
        scale_factor=2),
)
