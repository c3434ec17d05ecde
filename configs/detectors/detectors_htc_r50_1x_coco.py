# DetectoRS (reference configs/detectors/detectors_htc_r50_1x_coco.py,
# simplified to the Faster R-CNN + RFP + SAC pairing).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    backbone=dict(_delete_=True, type='DetectoRSResNet', depth=50,
                  output_img=True),
    neck=dict(_delete_=True, type='RFP',
              in_channels=[256, 512, 1024, 2048], out_channels=256,
              num_outs=5, rfp_steps=2,
              # recursive backbone (reference detectors_htc_r50:15-27)
              rfp_backbone=dict(type='DetectoRSResNet', depth=50,
                                rfp_inplanes=256)),
)
