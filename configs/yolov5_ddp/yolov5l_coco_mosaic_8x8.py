_base_ = '../yolov5/yolov5l_coco_mosaic.py'

optimizer = dict(lr=0.01)
data = dict(samples_per_gpu=8, workers_per_gpu=2)
optimizer_config = dict(_delete_=True, grad_clip=dict(max_norm=35))
compute_dtype = 'bfloat16'
