# Training from scratch (reference configs/scratch/): no pretrained
# backbone (tpudet always initializes fresh), longer schedule.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
runner = dict(type='EpochBasedRunner', max_epochs=72)
lr_config = dict(policy='step', step=[65, 71], gamma=0.1)
