#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""COCO-val evaluation of a trained detector
(reference tools/test.py analogue; metric 'fast-bbox' by default)."""
import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(description='Test a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='msgpack weights (EMA) saved by training')
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--metrics', nargs='+', default=['bbox'],
                   choices=['bbox', 'segm', 'proposal_fast'],
                   help="evaluation metrics (reference coco.py:412): "
                        "'bbox', 'segm' (mask-capable models), "
                        "'proposal_fast' (AR@100/300/1000)")
    p.add_argument('--mask-thr', type=float, default=0.5)
    p.add_argument('--tta', action='store_true',
                   help='flip test-time augmentation with merged-candidate '
                        'NMS (reference MultiScaleFlipAug + '
                        'aug_test_bboxes); single-stage models')
    p.add_argument('--coordinator', default=None,
                   help='jax.distributed coordinator address (multi-host '
                        'sharded eval; reference tools/dist_test.sh '
                        'launches multi_gpu_test the same way)')
    p.add_argument('--num-processes', type=int, default=None)
    p.add_argument('--process-id', type=int, default=None)
    p.add_argument('--out', help='dump results json')
    p.add_argument('--format-out',
                   help='dump detections in interchange COCO-result format '
                        'to <prefix>.bbox.json / <prefix>.segm.json '
                        '(reference coco.py results2json)')
    return p.parse_args()


def main():
    args = parse_args()

    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import (coco_fast_bbox_eval,
                                           coco_fast_segm_eval)
    from tpudet.parallel.mesh import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    with_masks = 'segm' in args.metrics
    results = single_device_test(det.model, det.variables, dataset,
                                 batch_size=args.batch_size,
                                 img_size=args.img_size,
                                 with_masks=with_masks,
                                 mask_thr=args.mask_thr, tta=args.tta)
    if with_masks:
        results, segm_results = results
    annotations = [
        dataset.get_ann_info_test(i) for i in range(len(dataset))
    ]
    report = {}
    if 'bbox' in args.metrics:
        report.update(coco_fast_bbox_eval(results, annotations,
                                          classes=dataset.CLASSES))
    if 'proposal_fast' in args.metrics:
        from tpudet.evaluation.recall import coco_proposal_fast_eval
        report.update(coco_proposal_fast_eval(results, annotations))
    if with_masks:
        report.update(coco_fast_segm_eval(results, segm_results,
                                          annotations,
                                          classes=dataset.CLASSES))
    # multi-host: results are all-gathered so every process holds the full
    # report, but only host 0 prints/writes — N hosts racing on the same
    # shared-FS paths corrupt them (reference gates eval on rank 0,
    # /root/reference/tools/test.py:215).
    import jax
    if jax.process_index() != 0:
        return
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f)
    if args.format_out:
        paths = dataset.results2json(
            results, args.format_out,
            segm_results=segm_results if with_masks else None)
        for metric, path in paths.items():
            print(f'wrote {metric} results to {path}')


if __name__ == '__main__':
    main()
