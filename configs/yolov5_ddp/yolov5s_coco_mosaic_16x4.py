# Multi-host YOLOv5-s (reference configs/yolov5_ddp/yolov5s_coco_mosaic_16x4.py).
#
# The reference swaps every norm layer to SyncBN (mmcv CUDA+NCCL kernels)
# for multi-node runs. Here there is nothing to swap: under jit over the
# data mesh, BatchNorm batch statistics are global-batch statistics by
# construction (XLA inserts the ICI collectives) — BN *is* SyncBN.
# This config only adjusts batch size / lr like the reference.
_base_ = '../yolov5/yolov5s_coco_mosaic.py'

optimizer = dict(lr=0.01)

data = dict(samples_per_gpu=16, workers_per_gpu=2)

optimizer_config = dict(_delete_=True, grad_clip=dict(max_norm=35))
compute_dtype = 'bfloat16'
