# Tencent traffic-sign dataset (reference fork
# mmdet/datasets/tencent_traffic.py + tencent_image_split.py tiling).
_base_ = '../yolov4/yolov4l_coco_mosaic.py'
model = dict(bbox_head=dict(num_classes=202))
data = dict(
    train=dict(type='TrafficSignDataset',
               ann_file='data/tencent/train_split.json',
               img_prefix='data/tencent/images_split/'),
    val=dict(type='TrafficSignDataset',
             ann_file='data/tencent/val_split.json',
             img_prefix='data/tencent/images_split/', test_mode=True),
    test=dict(type='TrafficSignDataset',
              ann_file='data/tencent/val_split.json',
              img_prefix='data/tencent/images_split/', test_mode=True))
