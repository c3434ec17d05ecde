# Garbage dataset (reference fork mmdet/datasets/garbage.py + its config
# usage): YOLOv4-l on the 44-class garbage detection set.
_base_ = '../yolov4/yolov4l_coco_mosaic.py'
model = dict(bbox_head=dict(num_classes=44))
data = dict(
    train=dict(type='GarbageDataset',
               ann_file='data/garbage/train.json',
               img_prefix='data/garbage/images/'),
    val=dict(type='GarbageDataset',
             ann_file='data/garbage/val.json',
             img_prefix='data/garbage/images/', test_mode=True),
    test=dict(type='GarbageDataset',
              ann_file='data/garbage/val.json',
              img_prefix='data/garbage/images/', test_mode=True))
