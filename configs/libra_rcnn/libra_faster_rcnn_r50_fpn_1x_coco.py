# Libra R-CNN (reference configs/libra_rcnn/
# libra_faster_rcnn_r50_fpn_1x_coco.py): FPN -> BFP balanced feature
# pyramid, IoU-balanced negative sampling, balanced L1 regression.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    neck=[
        dict(type='FPN', in_channels=[256, 512, 1024, 2048],
             out_channels=256, num_outs=5),
        dict(type='BFP', in_channels=256, num_levels=5, refine_level=2,
             refine_type='non_local'),
    ],
    roi_head=dict(neg_sampling='iou_balanced', neg_num_bins=3,
                  loss_bbox_type='balanced_l1'),
)
