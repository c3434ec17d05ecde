# reference configs/fp16/faster_rcnn_r50_fpn_fp16_1x_coco.py
# (AMP on GPU; here compute_dtype=bfloat16 with fp32 masters — the TPU
# mixed-precision policy, see configs/fp16/retinanet_r50_fpn_fp16_1x)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
compute_dtype = 'bfloat16'
