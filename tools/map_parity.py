#!/usr/bin/env python
import os as _os, sys as _sys  # noqa: E401
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(_file_ := __file__)))
_sys.path.insert(0, _REPO)
_sys.path.insert(0, _os.path.join(_REPO, 'tests'))
"""Two-stack mAP A/B: the SAME trained weights, the SAME images, through
BOTH eval flows — tpudet's (tools/test.py path: letterbox -> jitted
forward/decode/NMS -> fast-bbox evaluator) and the LIVE PyTorch
reference's (CocoDataset test pipeline -> simple_test -> results2json ->
CocoDataset.evaluate(metric='bbox'),
/root/reference/mmdet/datasets/coco.py:412-637) — reporting both mAPs and
the delta. This converts the per-stage parity suite into the north star's
own currency ("COCO mAP within 0.2 of the reference").

Flow:
  1. generate a synthetic COCO-format detection dataset (colored shapes
     on noise, real JPEG files + annotation json);
  2. train tpudet YOLOv4-s (narrow) on it for --steps;
  3. eval the EMA weights with tpudet's stack -> mAP_tpudet;
  4. convert the SAME weights into the live reference model
     (tpudet.utils.weight_convert.assign_flax_to_torch) and eval with the
     reference's stack -> mAP_ref;
  5. write docs/map_parity.json.
"""
import argparse
import json


def make_synthetic_coco(root, n_images=300, seed=0, min_side=140,
                        max_side=200):
    """COCO-format dataset of colored shapes: 4 classes (red box, green
    box, blue disk, yellow stripe) on uint8 noise backgrounds."""
    import cv2
    import numpy as np

    rng = np.random.RandomState(seed)
    _os.makedirs(root, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    classes = ('red_box', 'green_box', 'blue_disk', 'yellow_stripe')
    for i in range(n_images):
        h = int(rng.randint(min_side, max_side))
        w = int(rng.randint(min_side, max_side))
        img = rng.randint(30, 90, (h, w, 3)).astype(np.uint8)  # dim noise
        n_obj = int(rng.randint(1, 6))
        for _ in range(n_obj):
            cls = int(rng.randint(0, 4))
            bw = int(rng.randint(20, max(21, w // 3)))
            bh = int(rng.randint(20, max(21, h // 3)))
            if cls == 3:  # stripe: wide and short
                bw, bh = max(bw, 40), max(12, bh // 3)
            x = int(rng.randint(0, w - bw))
            y = int(rng.randint(0, h - bh))
            color = [(40, 40, 230), (40, 230, 40), (230, 60, 40),
                     (40, 220, 230)][cls]  # BGR
            if cls == 2:
                cv2.ellipse(img, (x + bw // 2, y + bh // 2),
                            (bw // 2, bh // 2), 0, 0, 360, color, -1)
            else:
                cv2.rectangle(img, (x, y), (x + bw - 1, y + bh - 1),
                              color, -1)
            annotations.append(dict(
                id=ann_id, image_id=i + 1,
                bbox=[float(x), float(y), float(bw), float(bh)],
                area=float(bw * bh), iscrowd=0, category_id=cls + 1))
            ann_id += 1
        fn = f'img{i:04d}.jpg'
        cv2.imwrite(_os.path.join(root, fn), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        images.append(dict(id=i + 1, file_name=fn, width=w, height=h))
    ann_file = _os.path.join(root, 'ann.json')
    with open(ann_file, 'w') as f:
        json.dump(dict(
            images=images, annotations=annotations,
            categories=[dict(id=c + 1, name=n)
                        for c, n in enumerate(classes)]), f)
    return ann_file, classes


MODEL_NECK_OUT = [64, 64, 64]


def make_cfg(root, ann, classes, img_size):
    from tpudet.config import Config
    img_norm = dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(img_size, img_size),
             keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Pad', size_divisor=32),
        dict(type='Normalize', **img_norm),
    ]
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(img_size, img_size),
             flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Normalize', **img_norm),
             ]),
    ]
    ds = dict(type='CocoDataset', ann_file=ann, img_prefix=root,
              classes=classes)
    return Config(dict(
        model=dict(
            type='SingleStageDetector',
            backbone=dict(type='DarknetCSP', scale='v4s5p',
                          out_indices=[3, 4, 5],
                          space_to_depth_stem=False),
            neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                      out_channels=MODEL_NECK_OUT, csp_repetition=1),
            bbox_head=dict(type='YOLOCSPHead', num_classes=len(classes),
                           in_channels=MODEL_NECK_OUT),
            # reference-exact NMS semantics for the A/B: uncapped
            # candidates, shipped thresholds, maxDets-compatible cap
            test_cfg=dict(nms_pre=-1, score_thr=0.001,
                          nms=dict(type='nms', iou_threshold=0.65),
                          max_per_img=100)),
        data=dict(
            samples_per_gpu=8, workers_per_gpu=1,
            train_img_size=img_size, max_gts=8,
            train={**ds, 'pipeline': pipeline},
            val={**ds, 'pipeline': test_pipeline, 'test_mode': True},
            test={**ds, 'pipeline': test_pipeline, 'test_mode': True}),
        nominal_batch_size=8,
        optimizer=dict(lr=0.01, momentum=0.937, weight_decay=5e-4,
                       nesterov=True),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(min_lr_ratio=0.2),
        custom_hooks=[
            dict(type='DetailedLinearWarmUpHook', warmup_iters=50),
            dict(type='StateEMAHook', momentum=0.999, warm_up=200),
        ],
        runner=dict(max_epochs=10000),  # bounded by max_steps
        evaluation=dict(interval=0),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=50),
        seed=0))


def eval_tpudet(cfg, ckpt, img_size, batch_size=8):
    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    det = init_detector(cfg, ckpt)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    results = single_device_test(det.model, det.variables, dataset,
                                 batch_size=batch_size, img_size=img_size,
                                 progress=False)
    annotations = [dataset.get_ann_info_test(i)
                   for i in range(len(dataset))]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=dataset.CLASSES)
    return {k: float(v) for k, v in report.items()}, det, results


def cocoeval_on_tpudet_dets(ann_file, results):
    """Score tpudet's detections with the SAME evaluator the reference
    flow uses (the shim's pycocotools-protocol COCOeval), removing the
    fast-bbox-vs-COCOeval AP-interpolation difference from the A/B."""
    from ref_oracle import refbridge
    refbridge.setup()
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    gt = COCO(ann_file)
    img_ids = sorted(gt.getImgIds())
    cat_ids = sorted(gt.getCatIds())
    dets = []
    for img_id, per_class in zip(img_ids, results):
        for c, arr in enumerate(per_class):
            for row in arr:
                dets.append(dict(
                    image_id=img_id, category_id=cat_ids[c],
                    bbox=[float(row[0]), float(row[1]),
                          float(row[2] - row[0]),
                          float(row[3] - row[1])],
                    score=float(row[4])))
    if not dets:
        return dict(bbox_mAP=0.0, bbox_mAP_50=0.0, bbox_mAP_75=0.0)
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, 'bbox')
    e.params.maxDets = [100, 300, 1000]
    e.evaluate()
    e.accumulate()
    e.summarize()
    return dict(bbox_mAP=float(e.stats[0]), bbox_mAP_50=float(e.stats[1]),
                bbox_mAP_75=float(e.stats[2]))


def eval_reference(cfg, det, img_size, classes):
    """Load the tpudet weights into the live reference model and run the
    reference's own test flow end-to-end."""
    import numpy as np
    import torch
    from ref_oracle import refbridge
    from tpudet.utils.weight_convert import (assign_flax_to_torch,
                                             flax_layer_order,
                                             torch_module_refs)

    mmcv = refbridge.ref_import('mmcv')
    models = refbridge.ref_import('mmdet.models')
    datasets = refbridge.ref_import('mmdet.datasets')

    model_cfg = json.loads(json.dumps(dict(cfg['model'])))
    model_cfg['backbone'].pop('space_to_depth_stem', None)
    torch.manual_seed(0)
    ref = models.build_detector(mmcv.ConfigDict(model_cfg))
    ref.eval()
    ref.CLASSES = classes

    import jax.numpy as jnp
    order = flax_layer_order(det.model,
                             jnp.zeros((1, img_size, img_size, 3)))
    x = torch.zeros(1, 3, img_size, img_size)
    mods = torch_module_refs(ref, lambda m: m.forward_dummy(x))
    assign_flax_to_torch(det.variables, order, mods)

    data_cfg = json.loads(json.dumps(dict(cfg['data']['test'])))
    data_cfg.pop('test_mode', None)
    pipeline = data_cfg.pop('pipeline')
    # the reference test pipeline formats via ImageToTensor + Collect
    pipeline[1]['transforms'] += [
        dict(type='ImageToTensor', keys=['img']),
        dict(type='Collect', keys=['img']),
    ]
    dataset = datasets.CocoDataset(pipeline=pipeline, test_mode=True,
                                   **data_cfg)

    results = []
    with torch.no_grad():
        for i in range(len(dataset)):
            data = dataset[i]
            img = data['img'][0][None]
            meta = data['img_metas'][0].data
            results.append(ref.simple_test(img, [meta], rescale=True))
    results = [r[0] if isinstance(r, list) else r for r in results]
    report = dataset.evaluate(results, metric='bbox')
    return {k: float(v) for k, v in report.items()}


def main():
    try:
        from tpudet.utils.jax_cache import enable_persistent_cache
        enable_persistent_cache()
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-images', type=int, default=300)
    ap.add_argument('--img-size', type=int, default=160)
    ap.add_argument('--steps', type=int, default=600)
    ap.add_argument('--work-dir', default='/tmp/map_parity')
    ap.add_argument('--out', default=None,
                    help='artifact json (default docs/map_parity.json)')
    args = ap.parse_args()

    data_root = _os.path.join(args.work_dir, 'data')
    ann, classes = make_synthetic_coco(data_root, args.n_images)
    print(f'dataset: {args.n_images} images, {len(classes)} classes')

    cfg = make_cfg(data_root, ann, classes, args.img_size)
    from tpudet.apis.train import train_detector
    metrics = train_detector(cfg, args.work_dir, max_steps=args.steps,
                             resume=False)
    print(f'trained {args.steps} steps, loss={float(metrics["loss"]):.4f}')

    ckpt = _os.path.join(args.work_dir, 'latest_ema.msgpack')
    my_report, det, my_results = eval_tpudet(cfg, ckpt, args.img_size)
    print('tpudet fast-bbox :',
          {k: round(v, 4) for k, v in my_report.items()})
    my_cocoeval = cocoeval_on_tpudet_dets(ann, my_results)
    print('tpudet COCOeval  :',
          {k: round(v, 4) for k, v in my_cocoeval.items()})

    ref_report = eval_reference(cfg, det, args.img_size, classes)
    print('reference COCOeval:',
          {k: round(v, 4) for k, v in ref_report.items()})

    # primary delta: SAME evaluator protocol (COCOeval) on each stack's
    # own detections -> isolates preprocessing/forward/decode/NMS
    keys = ('bbox_mAP', 'bbox_mAP_50', 'bbox_mAP_75')
    deltas = {k: round(abs(my_cocoeval[k] - ref_report[k]), 5)
              for k in keys if k in my_cocoeval and k in ref_report}
    artifact = {
        'protocol': 'same trained weights + same images through both '
                    'stacks; tpudet: letterbox->jit fwd/decode/NMS; '
                    'reference: CocoDataset pipeline->simple_test. '
                    'Primary delta scores BOTH det sets with the same '
                    'COCOeval protocol; tpudet fast-bbox reported too '
                    '(differs from COCOeval only in AP interpolation).',
        'n_images': args.n_images,
        'img_size': args.img_size,
        'train_steps': args.steps,
        'tpudet_fast_bbox': my_report,
        'tpudet_cocoeval': my_cocoeval,
        'reference_cocoeval': ref_report,
        'abs_delta': deltas,
        'budget': 'mAP within 0.2 of the reference (BASELINE.json)',
        'within_budget': all(d <= 0.2 for d in deltas.values()),
    }
    out = args.out or _os.path.join(_REPO, 'docs', 'map_parity.json')
    with open(out, 'w') as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({'map_delta': deltas.get('map'),
                      'within_budget': artifact['within_budget'],
                      'artifact': out}))


def _maybe_reexec_with_remote_compile():
    """Same as bench.py: XLA:TPU compiles take minutes on this 1-core
    host but seconds via the terminal-side compile service; the flag is
    read at interpreter start, so re-exec once with it set."""
    if _os.environ.get('PALLAS_AXON_REMOTE_COMPILE') != '1' and \
            _os.environ.get('TPUDET_NO_REEXEC') != '1':
        _os.environ['PALLAS_AXON_REMOTE_COMPILE'] = '1'
        _os.environ['TPUDET_NO_REEXEC'] = '1'
        _os.execve(_sys.executable, [_sys.executable] + _sys.argv,
                   _os.environ)


if __name__ == '__main__':
    _maybe_reexec_with_remote_compile()
    main()
