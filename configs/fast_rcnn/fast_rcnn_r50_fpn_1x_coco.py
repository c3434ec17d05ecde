# Fast R-CNN with precomputed proposals (reference configs/fast_rcnn/
# fast_rcnn_r50_fpn_1x_coco.py). The caller supplies padded (B, P, 4)
# proposals + validity at both train and test time.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    _delete_=True,
    type='FastRCNN',
    backbone=dict(type='ResNet', depth=50, out_indices=[0, 1, 2, 3]),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    roi_head=dict(type='StandardRoIHead', num_classes=80, in_channels=256),
    test_cfg=dict(rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                            max_per_img=100)),
)
