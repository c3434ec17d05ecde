# Sparse R-CNN (reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    _delete_=True,
    type='SparseRCNN',
    backbone=dict(type='ResNet', depth=50, out_indices=[0, 1, 2, 3]),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=4),
    rpn_head=dict(type='EmbeddingRPNHead', num_proposals=100),
    roi_head=dict(type='SparseRoIHead', num_classes=80, in_channels=256,
                  num_stages=6),
    test_cfg=dict(max_per_img=100),
)
optimizer = dict(type='AdamW', lr=2.5e-5, weight_decay=1e-4)
