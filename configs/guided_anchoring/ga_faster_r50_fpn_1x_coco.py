# GA-Faster R-CNN (reference configs/guided_anchoring/
# ga_faster_r50_fpn_1x_coco.py): Faster R-CNN with a GA-RPN proposal head.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    rpn_head=dict(
        _delete_=True,
        type='GARPNHead',
        in_channels=256,
        feat_channels=256,
        strides=[4, 8, 16, 32, 64],
        octave_base_scale=8,
        scales_per_octave=3,
        ratios=[0.5, 1.0, 2.0]),
    train_cfg=dict(
        rpn_proposal=dict(nms_pre=1000, max_per_img=300,
                          nms=dict(iou_threshold=0.7))),
    test_cfg=dict(rpn=dict(nms_pre=1000, max_per_img=300,
                           nms=dict(iou_threshold=0.7))),
)
