# reference configs/pascal_voc/ssd300_voc0712.py
_base_ = '../ssd/ssd300_coco.py'
model = dict(bbox_head=dict(num_classes=20,
                            basesize_ratio_range=(0.2, 0.9)))
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
