# PISA Faster R-CNN (reference configs/pisa/pisa_faster_rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    roi_head=dict(type='PISARoIHead', isr_k=2.0, isr_bias=0.0,
                  carl_k=1.0, carl_bias=0.2),
    train_cfg=dict(
        rpn_proposal=dict(nms_pre=2000, max_per_img=2000,
                          nms=dict(iou_threshold=0.7))),
)
