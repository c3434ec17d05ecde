# Mixed precision training (reference configs/fp16/retinanet_r50_fpn_fp16
# uses fp16+GradScaler; the TPU equivalent is bf16 compute with fp32
# master weights — no scaler needed).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
compute_dtype = 'bfloat16'
