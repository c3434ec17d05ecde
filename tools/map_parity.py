#!/usr/bin/env python
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)
_sys.path.insert(0, _os.path.join(_REPO, 'tests'))
"""Two-stack mAP A/B: one weight set, one COCO-format dataset on disk,
each stack's OWN shipped tools/test.py evaluation flow end to end.

- reference: its CocoDataset + shipped test pipeline
  (/root/reference/configs/yolov4/yolov4s_coco_mosaic.py:64-84) ->
  SingleStageDetector.simple_test
  (/root/reference/mmdet/models/detectors/single_stage.py:81) ->
  CocoDataset.evaluate(metric='bbox')
  (/root/reference/mmdet/datasets/coco.py:411) through the oracle shim's
  pycocotools (itself parity-tested in tests/ref_oracle/).
- tpudet: the literal `tools/test.py` CLI (fast-bbox evaluator), run as a
  subprocess at TWO operating points: the SHIPPED per-class NMS budgets
  and the exact uncapped nms_pre=-1 path.

Two weight/data protocols:

1. ``--checkpoint CKPT --data-root DIR`` (the headline): a TRAINED
   tpudet checkpoint (tools/train.py on configs/shapes/*.py) is
   converted flax->torch (tpudet/utils/weight_convert.py::
   assign_flax_to_torch) and both stacks are evaluated against the
   dataset's REAL ground truth (DIR/val.json). Trained weights give the
   A/B a realistic score surface — adjacent-rank score gaps are orders
   of magnitude above fp noise, so the delta measures genuine stack
   deviation, not tie-reordering.
2. default (no --checkpoint): a seeded reference-torch model is
   converted torch->jax and the dataset is synthetic SELF-LABELED
   (ground truth = the reference detector's own top detections), making
   the reference mAP ~1.0 by construction. Kept as the
   no-training-required smoke protocol; its score surface is degenerate
   (near-tied scores), which the artifact notes.

Models: --model {yolov4s, yolov5s, retinanet}; retinanet runs soft-NMS
(configs/shapes/retinanet_r50_shapes_320.py), exercising the soft-NMS
leg of the A/B. Results are merged into docs/map_parity.json keyed by
``<model>_<protocol>`` with the generating commit recorded.
"""
import argparse
import json
import os
import subprocess
import sys

import cv2
import numpy as np

SHAPE_CLASSES = ('rect', 'circle', 'triangle')


def model_cfgs(name, num_classes, softnms=False):
    """Reference-torch and tpudet model dicts (same structures as the
    pinned tests/ref_oracle/test_full_detector_parity.py) plus the
    shipped/exact test_cfg pair and the norm config."""
    if name in ('yolov4s', 'yolov5s'):
        test_base = dict(min_bbox_size=0, score_thr=0.001,
                         nms=dict(type='nms', iou_threshold=0.65),
                         max_per_img=300)
        shipped = dict(test_base, nms_pre=-1, anchor_pre=2048,
                       lane_pre=4, class_pre=256)
        exact = dict(test_base, nms_pre=-1)
        if name == 'yolov4s':
            backbone = dict(type='DarknetCSP', scale='v4s5p',
                            out_indices=[3, 4, 5])
            neck = dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                        out_channels=[128, 256, 512], csp_repetition=1)
        else:
            backbone = dict(type='DarknetCSP', scale='v5s5p',
                            out_indices=[2, 3, 4])
            neck = dict(type='YOLOV5Neck', in_channels=[128, 256, 512],
                        out_channels=[128, 256, 512], csp_repetition=1)
        ref_cfg = dict(
            type='SingleStageDetector', backbone=backbone, neck=neck,
            bbox_head=dict(type='YOLOCSPHead', num_classes=num_classes,
                           in_channels=[128, 256, 512]))
        my_cfg = json.loads(json.dumps(ref_cfg))
        my_cfg['backbone']['space_to_depth_stem'] = False
        norm = dict(mean=[114.0] * 3, std=[255.0] * 3, to_rgb=True)
        return ref_cfg, my_cfg, shipped, exact, norm
    if name == 'retinanet':
        nms = (dict(type='soft_nms', iou_threshold=0.3, min_score=0.05,
                    method='linear') if softnms
               else dict(type='nms', iou_threshold=0.5))
        shipped = dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                       nms=nms, max_per_img=100)
        exact = dict(shipped)  # nms_pre=1000 IS the reference semantics
        ref_cfg = dict(
            type='RetinaNet',
            backbone=dict(type='ResNet', depth=50, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1,
                          norm_cfg=dict(type='BN', requires_grad=True),
                          norm_eval=True, style='pytorch'),
            neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                      out_channels=256, start_level=1,
                      add_extra_convs='on_input', num_outs=5),
            bbox_head=dict(
                type='RetinaHead', num_classes=num_classes,
                in_channels=256, stacked_convs=4, feat_channels=256,
                anchor_generator=dict(
                    type='AnchorGenerator', octave_base_scale=4,
                    scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                    strides=[8, 16, 32, 64, 128]),
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0.0, 0.0, 0.0, 0.0],
                                target_stds=[1.0, 1.0, 1.0, 1.0]),
                loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                              gamma=2.0, alpha=0.25, loss_weight=1.0),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0)))
        my_cfg = dict(
            type='RetinaNet',
            backbone=dict(type='ResNet', depth=50,
                          out_indices=[0, 1, 2, 3]),
            neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
                      out_channels=256, start_level=1,
                      add_extra_convs='on_input', num_outs=5),
            bbox_head=dict(type='RetinaHead', num_classes=num_classes,
                           in_channels=256, feat_channels=256,
                           stacked_convs=4, strides=[8, 16, 32, 64, 128],
                           octave_base_scale=4, scales_per_octave=3,
                           ratios=[0.5, 1.0, 2.0]))
        norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
        return ref_cfg, my_cfg, shipped, exact, norm
    raise SystemExit(f'unknown --model {name}')


def make_images(workdir, n, seed=7):
    """High-contrast synthetic scenes for the self-label protocol:
    random filled rectangles over a noise floor (heavy blur over pure
    noise leaves post-normalization activations too small for a seeded
    detector to clear the self-label threshold)."""
    rng = np.random.RandomState(seed)
    sizes = [(480, 640), (640, 480), (512, 512), (426, 640)]
    img_dir = os.path.join(workdir, 'images')
    os.makedirs(img_dir, exist_ok=True)
    infos = []
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        for _ in range(12):
            x1 = rng.randint(0, w - 16)
            y1 = rng.randint(0, h - 16)
            x2 = x1 + rng.randint(12, max(13, w - x1))
            y2 = y1 + rng.randint(12, max(13, h - y1))
            color = tuple(int(c) for c in rng.randint(0, 256, 3))
            cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
        img = cv2.GaussianBlur(img, (3, 3), 1)
        name = f'{i:06d}.jpg'
        cv2.imwrite(os.path.join(img_dir, name),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 92])
        infos.append(dict(id=i + 1, file_name=name, height=h, width=w))
    return img_dir, infos


def write_ann(path, infos, annotations, class_names):
    cats = [dict(id=c + 1, name=nm, supercategory='none')
            for c, nm in enumerate(class_names)]
    with open(path, 'w') as f:
        json.dump(dict(images=infos, annotations=annotations,
                       categories=cats), f)


def build_ref_detector(model_cfg, test_cfg, seed_scores=True):
    """Seeded reference detector; same construction as the full-detector
    parity oracle (tests/ref_oracle/test_full_detector_parity.py)."""
    import torch
    from ref_oracle import refbridge
    mmcv = refbridge.ref_import('mmcv')
    models = refbridge.ref_import('mmdet.models')
    torch.manual_seed(0)
    ref = models.build_detector(
        mmcv.ConfigDict(dict(model_cfg, test_cfg=test_cfg)))
    ref.eval()
    if not seed_scores:
        return ref
    torch.manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.7, 1.3)
    # Structured pred-conv biases so the seeded detector emits a healthy,
    # GEOMETRICALLY SANE candidate set (fresh bias priors put every score
    # below the threshold; a blanket random bias makes the top channel's
    # wh bias collapse widths to sub-pixel slivers that the self-label
    # w/h >= 1 filter would drop):
    #   xy/wh -> 0 (box == anchor-sized at the cell center),
    #   conf  -> -1.5 (sigmoid ~0.18),
    #   cls   -> normal(-3.0, 1.5) (spread of per-class scores).
    torch.manual_seed(2)
    na = len(ref.bbox_head.anchor_generator.base_sizes[0])
    attrib = 5 + ref.bbox_head.num_classes
    for conv in ref.bbox_head.convs_pred:
        b = conv.bias.data.view(na, attrib)
        b[:, :4] = 0.0
        b[:, 4] = -1.5
        b[:, 5:].normal_(-3.0, 1.5)
    return ref


def ref_test_pipeline(size, norm):
    return [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(size, size), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Normalize', **norm),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ]),
    ]


def run_reference(ref, dataset):
    """Per-image reference tools/test.py flow (the shim has no collate,
    so the single_gpu_test loop is driven image-by-image — same pipeline,
    same simple_test, same rescale)."""
    import torch
    results = []
    with torch.no_grad():
        for i in range(len(dataset)):
            data = dataset[i]
            img = data['img'][0]
            meta = data['img_metas'][0].data
            res = ref.simple_test(img[None], [meta], rescale=True)[0]
            results.append([np.asarray(r) for r in res])
            if (i + 1) % 50 == 0:
                print(f'  ref inference {i + 1}/{len(dataset)}',
                      file=sys.stderr)
    return results


def convert_trained_to_ref(ref, mine, ckpt_path, img_size):
    """Load a trained tpudet checkpoint and copy its (EMA) weights into
    the reference torch detector, zipping execution-order layer
    sequences (tpudet/utils/weight_convert.py)."""
    import torch

    from tpudet.utils.checkpoint import load_variables
    from tpudet.utils.weight_convert import (assign_flax_to_torch,
                                             flax_layer_order,
                                             torch_module_refs)
    variables, meta = load_variables(ckpt_path)
    x_nhwc = np.zeros((1, img_size, img_size, 3), np.float32)
    order = flax_layer_order(mine, x_nhwc)
    torch_mods = torch_module_refs(
        ref, lambda m: m.forward_dummy(
            torch.zeros(1, 3, img_size, img_size)))
    assign_flax_to_torch(variables, order, torch_mods)
    return variables


def git_rev():
    try:
        return subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                              cwd=_REPO, capture_output=True,
                              text=True).stdout.strip()
    except OSError:
        return 'unknown'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--model', default='yolov4s',
                   choices=['yolov4s', 'yolov5s', 'retinanet'])
    p.add_argument('--checkpoint', default=None,
                   help='trained tpudet msgpack checkpoint (e.g. '
                        'best_ema.msgpack from tools/train.py on '
                        'configs/shapes/); switches the protocol to '
                        'trained weights + REAL ground truth')
    p.add_argument('--data-root', default='data/shapes',
                   help='shapes dataset root (tools/misc/synth_shapes.py '
                        'output) used with --checkpoint')
    p.add_argument('--num-images', type=int, default=300,
                   help='self-label protocol image count')
    p.add_argument('--img-size', type=int, default=320)
    p.add_argument('--workdir', default='/tmp/map_parity')
    p.add_argument('--gt-per-img', type=int, default=15)
    p.add_argument('--gt-score-thr', type=float, default=0.05)
    p.add_argument('--score-thr', type=float, default=None, help=(
        'test_cfg.score_thr applied identically to BOTH stacks; default '
        'is per-model (yolo 0.02 self-label / shipped 0.001 trained, '
        'retinanet 0.05). The self-label default is raised because the '
        'oracle shim\'s trustworthy-by-simplicity python greedy NMS is '
        '~60s/image at 0.001 (~500k candidates).'))
    p.add_argument('--out', default='docs/map_parity.json')
    args = p.parse_args()

    trained = args.checkpoint is not None
    if args.score_thr is None:
        if args.model == 'retinanet':
            args.score_thr = 0.05
        else:
            # the shim NMS cost scales with candidates above score_thr;
            # trained models emit few confident candidates, so the
            # shipped 0.001 stays tractable — seeded models emit ~500k
            args.score_thr = 0.001 if trained else 0.02
    num_classes = len(SHAPE_CLASSES) if trained else 80
    ref_cfg, my_cfg, shipped_cfg, exact_cfg, norm = model_cfgs(
        args.model, num_classes, softnms=(args.model == 'retinanet'))
    for c in (shipped_cfg, exact_cfg):
        c['score_thr'] = args.score_thr

    os.makedirs(args.workdir, exist_ok=True)
    # the reference flow slices [:max_per_img] after batched_nms, so the
    # shim's per-class kept cap at the same value is exact (see
    # _shim/mmcv/ops/nms.py::batched_nms) and ~60x faster per image
    os.environ.setdefault('TPUDET_SHIM_NMS_CLASS_MAX',
                          str(shipped_cfg['max_per_img']))
    from ref_oracle import refbridge
    refbridge.setup()
    from tpudet.data.dataset import COCO_CLASSES
    from tpudet.models.builder import build_detector as build_mine

    s = args.img_size
    classes = SHAPE_CLASSES if trained else COCO_CLASSES

    if trained:
        data_root = os.path.abspath(args.data_root)
        ann_path = os.path.join(data_root, 'val.json')
        img_dir = os.path.join(data_root, 'val', 'images') + '/'
        with open(ann_path) as f:
            n_gt = len(json.load(f)['annotations'])
        ref = build_ref_detector(ref_cfg, exact_cfg, seed_scores=False)
        mine = build_mine(dict(my_cfg, test_cfg=exact_cfg))
        convert_trained_to_ref(ref, mine, args.checkpoint, s)
        ckpt_path = os.path.abspath(args.checkpoint)
    else:
        img_dir, infos = make_images(args.workdir, args.num_images)
        ann_path = os.path.join(args.workdir, 'annotations.json')
        # pass A needs a dataset object before GT exists: empty annotations
        write_ann(ann_path, infos, [], classes)
        ref = build_ref_detector(ref_cfg, exact_cfg)
        img_dir += '/'

    ref_datasets = refbridge.ref_import('mmdet.datasets')
    dataset_cfg = dict(type='CocoDataset', ann_file=ann_path,
                       img_prefix=img_dir,
                       pipeline=ref_test_pipeline(s, norm), test_mode=True)
    if trained:
        dataset_cfg['classes'] = list(classes)
    ref_dataset = ref_datasets.build_dataset(dataset_cfg)
    print('reference inference pass...', file=sys.stderr)
    ref_results = run_reference(ref, ref_dataset)

    if not trained:
        # self-label: top detections become GT
        annotations = []
        aid = 1
        for i, per_class in enumerate(ref_results):
            dets = []
            for c, arr in enumerate(per_class):
                for row in arr:
                    dets.append((float(row[4]), c, row[:4]))
            dets.sort(key=lambda d: -d[0])
            kept = [d for d in dets if d[0] >= args.gt_score_thr]
            kept = kept[:args.gt_per_img]
            for score, c, box in kept:
                x1, y1, x2, y2 = [float(v) for v in box]
                w, h = max(x2 - x1, 0.0), max(y2 - y1, 0.0)
                if w < 1 or h < 1:
                    continue
                annotations.append(dict(
                    id=aid, image_id=i + 1, category_id=c + 1,
                    bbox=[x1, y1, w, h], area=w * h, iscrowd=0))
                aid += 1
        write_ann(ann_path, infos, annotations, classes)
        n_gt = len(annotations)
        print(f'self-labeled {n_gt} GT over {args.num_images} images',
              file=sys.stderr)
        # rebuild so the dataset loads the final annotations
        ref_dataset = ref_datasets.build_dataset(dataset_cfg)

    # reference eval flow: CocoDataset.evaluate(metric='bbox')
    ref_eval = ref_dataset.evaluate(
        [[arr for arr in per_class] for per_class in ref_results],
        metric='bbox')
    ref_map = float(ref_eval['bbox_mAP'])
    ref_map50 = float(ref_eval.get('bbox_mAP_50', float('nan')))
    print(f'reference mAP={ref_map} mAP50={ref_map50}', file=sys.stderr)

    if not trained:
        # convert the seeded torch weight set to tpudet
        import jax
        import torch
        from tpudet.utils.checkpoint import save_variables
        from tpudet.utils.weight_convert import (assign_torch_sequence,
                                                 flax_layer_order,
                                                 torch_module_sequence)
        mine = build_mine(dict(my_cfg, test_cfg=exact_cfg))
        x_nhwc = np.zeros((1, s, s, 3), np.float32)
        order = flax_layer_order(mine, x_nhwc)
        torch_layers = torch_module_sequence(
            ref, lambda m: m.forward_dummy(torch.zeros(1, 3, s, s)))
        variables = mine.init(jax.random.PRNGKey(0), x_nhwc)
        variables = assign_torch_sequence(variables, order, torch_layers)
        ckpt_path = os.path.join(args.workdir, 'converted.msgpack')
        save_variables(ckpt_path, variables,
                       meta=dict(CLASSES=list(classes)))

    # tpudet eval flow: the literal tools/test.py CLI at the shipped
    # budgets and (for yolo) the exact nms_pre=-1 dense path
    def run_tpudet(tag, test_cfg):
        cfg_i = json.loads(json.dumps(my_cfg))
        cfg_i['test_cfg'] = test_cfg
        cfg_path = os.path.join(args.workdir, f'tpudet_cfg_{tag}.py')
        ds = dict(type='CocoDataset', ann_file=ann_path,
                  img_prefix=img_dir, test_mode=True)
        if trained:
            ds['classes'] = tuple(classes)
        with open(cfg_path, 'w') as f:
            f.write(
                'model = ' + repr(cfg_i) + '\n'
                'img_norm_cfg = ' + repr(norm) + '\n'
                'test_pipeline = [\n'
                "    dict(type='LoadImageFromFile'),\n"
                "    dict(type='MultiScaleFlipAug', img_scale=(%d, %d),"
                ' flip=False,\n'
                '         transforms=[\n'
                "             dict(type='Resize', keep_ratio=True),\n"
                "             dict(type='RandomFlip'),\n"
                "             dict(type='Pad', size_divisor=32),\n"
                "             dict(type='Normalize', **img_norm_cfg),\n"
                '         ]),\n'
                ']\n'
                'data = dict(\n'
                '    samples_per_gpu=8,\n'
                '    test=dict(pipeline=test_pipeline, **%r))\n'
                % (s, s, ds))
        out_path = os.path.join(args.workdir, f'tpudet_eval_{tag}.json')
        env = dict(os.environ)
        # hard override: the container env pins JAX_PLATFORMS=axon, and
        # the A/B's tpudet leg must run deterministic host CPU (the TPU
        # may also be busy benching)
        env['JAX_PLATFORMS'] = 'cpu'
        print(f'tpudet tools/test.py flow ({tag})...', file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(_REPO, 'tools', 'test.py'),
             cfg_path, ckpt_path, '--batch-size', '8',
             '--img-size', str(s), '--metrics', 'bbox', '--out', out_path],
            check=True, env=env, cwd=_REPO)
        with open(out_path) as f:
            ev = json.load(f)
        print(f'tpudet ({tag}) mAP={ev["map"]} mAP50={ev["map50"]}',
              file=sys.stderr)
        return float(ev['map']), float(ev['map50'])

    my_map, my_map50 = run_tpudet('shipped', shipped_cfg)
    if exact_cfg != shipped_cfg:
        my_map_exact, my_map50_exact = run_tpudet('exact', exact_cfg)
    else:
        my_map_exact, my_map50_exact = my_map, my_map50

    protocol = 'trained' if trained else 'selflabel'
    key = f'{args.model}_{protocol}'
    run = dict(
        model=args.model, protocol=protocol, img_size=s,
        score_thr=args.score_thr, num_gt=n_gt,
        num_images=(len(ref_results)),
        checkpoint=(os.path.basename(args.checkpoint) if trained
                    else 'seeded-reference-conversion'),
        nms=('soft_nms' if args.model == 'retinanet' else 'nms'),
        shipped_budgets={k: shipped_cfg[k] for k in
                         ('anchor_pre', 'lane_pre', 'class_pre', 'nms_pre')
                         if k in shipped_cfg},
        reference_mAP=round(ref_map, 4),
        reference_mAP50=round(ref_map50, 4),
        tpudet_mAP=round(my_map, 4),
        tpudet_mAP50=round(my_map50, 4),
        delta_mAP=round(my_map - ref_map, 4),
        tpudet_mAP_exact=round(my_map_exact, 4),
        tpudet_mAP50_exact=round(my_map50_exact, 4),
        delta_mAP_exact=round(my_map_exact - ref_map, 4),
        within_budget=bool(abs(my_map - ref_map) <= 0.2),
        generated_at_commit=git_rev(),
    )

    # merge into the artifact (one file, all models/protocols)
    artifact = dict(
        protocol='one weight set; COCO-format dataset on disk; each '
                 'stack runs its OWN shipped tools/test.py eval flow '
                 '(reference: pipeline + simple_test + '
                 'CocoDataset.evaluate bbox; tpudet: tools/test.py CLI '
                 '+ fast-bbox evaluator, at the shipped NMS budgets AND '
                 'the exact nms_pre=-1 path). trained runs use a real '
                 'tools/train.py checkpoint (configs/shapes/) converted '
                 'flax->torch and REAL ground truth; selflabel runs use '
                 'a seeded torch model converted torch->jax with GT = '
                 'its own detections (degenerate near-tied score '
                 'surface; see note)',
        north_star_budget=0.2,
        note='selflabel deltas are dominated by rank reordering among '
             'near-tied scores (adjacent-rank gaps ~3e-6 by '
             'construction); trained runs have realistic score gaps and '
             'are the headline. Budget cost is isolated by '
             'shipped-vs-exact on the same stack.',
        runs={})
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                old = json.load(f)
            if 'runs' in old:
                artifact['runs'] = old['runs']
        except (ValueError, KeyError):
            pass
    artifact['runs'][key] = run
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(run))


if __name__ == '__main__':
    main()
