"""Two-stage learning sanity: overfit Faster R-CNN on a tiny fixed batch
through the full RPN -> sampling -> RoI pipeline -> decode -> NMS ->
evaluator loop (companion to test_overfit.py's YOLO version)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.apis.inference import nms_result_to_per_class
from tpudet.evaluation.mean_ap import eval_map_flexible
from tpudet.models.builder import build_detector
from tpudet.train.optim import YoloSGDConfig
from tpudet.train.train_state import create_train_state, make_train_step

from .test_overfit import make_batch


def test_faster_rcnn_overfit_tiny_batch():
    model = build_detector(dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64),
        roi_head=dict(type='StandardRoIHead', num_classes=3,
                      in_channels=64, num_samples=64),
        train_cfg=dict(rpn_proposal=dict(nms_pre=256, max_per_img=64)),
        test_cfg=dict(rpn=dict(nms_pre=256, max_per_img=64),
                      rcnn=dict(score_thr=0.1,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10))))
    batch = make_batch(size=64)
    opt_cfg = YoloSGDConfig(lr=0.02, momentum=0.9, total_steps=300,
                            warmup_iters=20, min_lr_ratio=0.2,
                            weight_decay=0.0)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), opt_cfg)

    def loss_fn(params, batch_stats, b):
        losses, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            b['img'], b['gt_bboxes'], b['gt_labels'], b['gt_valid'],
            method='forward_train', mutable=['batch_stats'])
        total = sum(v for k, v in losses.items() if 'loss' in k)
        return total, (losses, mutated['batch_stats'])

    step = jax.jit(make_train_step(model, opt_cfg, loss_fn=loss_fn))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    first_loss = None
    for i in range(300):
        state, metrics = step(state, batch_j)
        if first_loss is None:
            first_loss = float(metrics['loss'])
    final_loss = float(metrics['loss'])
    assert final_loss < first_loss * 0.5, (first_loss, final_loss)

    variables = {'params': state.ema_params,
                 'batch_stats': state.ema_batch_stats}
    outputs = model.apply(variables, batch_j['img'])
    res = model.get_bboxes(outputs)
    results = nms_result_to_per_class(res, 3)

    annotations = []
    for i in range(4):
        n = int(batch['gt_valid'][i].sum())
        boxes = batch['gt_bboxes'][i][:n]
        area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        annotations.append(dict(
            gt_bboxes=boxes,
            gt_labels=batch['gt_labels'][i][:n].astype(np.int64),
            gt_attrs=dict(ignore=np.zeros(n, bool),
                          iscrowd=np.zeros(n, bool),
                          area=area.astype(np.float32))))
    report = eval_map_flexible(results, annotations, iou_thrs=[0.5],
                               classes=('a', 'b', 'c'))
    assert report['map'] > 0.3, report
