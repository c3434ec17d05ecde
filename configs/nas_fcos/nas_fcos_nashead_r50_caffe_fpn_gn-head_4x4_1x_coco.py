# NAS-FCOS (reference configs/nas_fcos/nas_fcos_nashead_r50_*).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'

model = dict(
    type='NASFCOS',
    neck=dict(_delete_=True, type='NASFCOS_FPN',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, start_level=1),
    bbox_head=dict(_delete_=True, type='NASFCOSHead', num_classes=80,
                   in_channels=256, feat_channels=256),
    test_cfg=dict(nms_pre=1000, score_thr=0.05,
                  nms=dict(iou_threshold=0.6), max_per_img=100),
)
