# RPN-only proposal model (reference configs/rpn/rpn_r50_fpn_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    _delete_=True,
    type='RPN',
    backbone=dict(type='ResNet', depth=50, out_indices=[0, 1, 2, 3]),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256),
    test_cfg=dict(rpn=dict(nms_pre=2000, max_per_img=1000,
                           nms=dict(iou_threshold=0.7))),
)
evaluation = dict(interval=1, metric='proposal_fast')
