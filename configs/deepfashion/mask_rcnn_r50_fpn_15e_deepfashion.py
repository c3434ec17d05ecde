# DeepFashion (reference configs/deepfashion/mask_rcnn_r50_fpn_15e).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(num_classes=15))
runner = dict(type='EpochBasedRunner', max_epochs=15)
data = dict(
    train=dict(type='DeepFashionDataset',
               ann_file='data/DeepFashion/annotations/train.json',
               img_prefix='data/DeepFashion/Img/'),
    val=dict(type='DeepFashionDataset',
             ann_file='data/DeepFashion/annotations/val.json',
             img_prefix='data/DeepFashion/Img/', test_mode=True),
    test=dict(type='DeepFashionDataset',
              ann_file='data/DeepFashion/annotations/val.json',
              img_prefix='data/DeepFashion/Img/', test_mode=True))
