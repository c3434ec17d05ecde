"""End-to-end learning sanity: overfit a tiny fixed batch and verify the
detector actually localizes — exercises target assignment, loss signs,
decode, NMS and the evaluator together. (The reference's equivalent
assurance comes from full training runs; this is the CI-sized version.)"""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.apis.inference import nms_result_to_per_class
from tpudet.evaluation.mean_ap import eval_map_flexible
from tpudet.models.builder import build_detector
from tpudet.train.optim import YoloSGDConfig
from tpudet.train.train_state import create_train_state, make_train_step


def make_batch(b=4, size=64, num_classes=3, seed=3):
    rng = np.random.RandomState(seed)
    img = rng.rand(b, size, size, 3).astype(np.float32) * 0.2
    g = 2
    gt = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    valid = np.ones((b, g), bool)
    for i in range(b):
        for j in range(g):
            w, h = rng.randint(18, 30, 2)
            x = rng.randint(2, size - w - 2)
            y = rng.randint(2, size - h - 2)
            gt[i, j] = (x, y, x + w, y + h)
            labels[i, j] = rng.randint(0, num_classes)
            # paint a class-colored rectangle so the task is learnable
            img[i, y:y + h, x:x + w, labels[i, j]] = 1.0
    return dict(img=img, gt_bboxes=gt, gt_labels=labels, gt_valid=valid)


def test_yolo_overfit_tiny_batch():
    cfg = dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                  out_channels=[64, 64, 64], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=3,
                       in_channels=[64, 64, 64]),
        test_cfg=dict(nms_pre=256, score_thr=0.1,
                      nms=dict(type='nms', iou_threshold=0.65),
                      max_per_img=10))
    model = build_detector(cfg)
    batch = make_batch()
    opt_cfg = YoloSGDConfig(lr=0.01, momentum=0.9, total_steps=300,
                            warmup_iters=20, min_lr_ratio=0.2,
                            weight_decay=0.0)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), opt_cfg)
    step = jax.jit(make_train_step(model, opt_cfg))

    first_loss = None
    for i in range(300):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics['loss'])
    final_loss = float(metrics['loss'])
    assert final_loss < first_loss * 0.25, (first_loss, final_loss)

    # evaluate with EMA weights on the training batch
    variables = {'params': state.ema_params,
                 'batch_stats': state.ema_batch_stats}
    pred_maps = model.apply(variables, jnp.asarray(batch['img']))
    res = model.get_bboxes(pred_maps)
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
    assert report['map'] > 0.5, report
