# Pascal VOC training (reference configs/pascal_voc/faster_rcnn_r50_*).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(num_classes=20))
data = dict(
    train=dict(type='VOCDataset',
               ann_file='data/VOCdevkit/VOC2007/ImageSets/Main/trainval.txt',
               img_prefix='data/VOCdevkit/VOC2007/'),
    val=dict(type='VOCDataset',
             ann_file='data/VOCdevkit/VOC2007/ImageSets/Main/test.txt',
             img_prefix='data/VOCdevkit/VOC2007/', test_mode=True),
    test=dict(type='VOCDataset',
              ann_file='data/VOCdevkit/VOC2007/ImageSets/Main/test.txt',
              img_prefix='data/VOCdevkit/VOC2007/', test_mode=True))
