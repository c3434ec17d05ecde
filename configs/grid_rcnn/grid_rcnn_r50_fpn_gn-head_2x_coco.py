# Grid R-CNN (reference configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    type='GridRCNN',
    roi_head=dict(
        _delete_=True,
        type='GridRoIHead',
        num_classes=80,
        in_channels=256,
        grid_roi_size=14,
        grid_points=9,
        pos_radius=1.0,
        max_num_grid=192),
    test_cfg=dict(rcnn=dict(score_thr=0.03, nms=dict(iou_threshold=0.3),
                            max_per_img=100)),
)
runner = dict(type='EpochBasedRunner', max_epochs=25)
lr_config = dict(policy='step', step=[17, 23], gamma=0.1)
