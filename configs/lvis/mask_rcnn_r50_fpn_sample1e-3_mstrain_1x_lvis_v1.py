# LVIS v1 (reference configs/lvis/mask_rcnn_r50_fpn_sample1e-3_*).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(num_classes=1203))
data = dict(
    train=dict(type='ClassBalancedDataset', oversample_thr=1e-3,
               dataset=dict(type='LVISDataset',
                            ann_file='data/lvis/lvis_v1_train.json',
                            img_prefix='data/lvis/')),
    val=dict(type='LVISDataset', ann_file='data/lvis/lvis_v1_val.json',
             img_prefix='data/lvis/', test_mode=True),
    test=dict(type='LVISDataset', ann_file='data/lvis/lvis_v1_val.json',
              img_prefix='data/lvis/', test_mode=True))
