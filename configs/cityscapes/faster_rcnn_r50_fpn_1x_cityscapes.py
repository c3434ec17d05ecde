# Cityscapes (reference configs/cityscapes/faster_rcnn_r50_fpn_1x_*).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(num_classes=8))
data = dict(
    train=dict(type='CityscapesDataset',
               ann_file='data/cityscapes/annotations/'
                        'instancesonly_filtered_gtFine_train.json',
               img_prefix='data/cityscapes/leftImg8bit/train/'),
    val=dict(type='CityscapesDataset',
             ann_file='data/cityscapes/annotations/'
                      'instancesonly_filtered_gtFine_val.json',
             img_prefix='data/cityscapes/leftImg8bit/val/',
             test_mode=True),
    test=dict(type='CityscapesDataset',
              ann_file='data/cityscapes/annotations/'
                       'instancesonly_filtered_gtFine_val.json',
              img_prefix='data/cityscapes/leftImg8bit/val/',
              test_mode=True))
