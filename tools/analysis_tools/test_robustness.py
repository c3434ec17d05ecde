#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Robustness benchmark on corrupted COCO (reference
tools/analysis_tools/test_robustness.py): evaluate a detector over
corruption types x severities; severity 0 is the clean baseline. Writes
a json consumed by robustness_eval.py (mPC/rPC aggregation).

Corruptions come from the native tpudet.data.corruptions implementations
(the reference's ``imagecorruptions`` dependency is not available)."""
import argparse
import copy
import json


def parse_args():
    p = argparse.ArgumentParser(description='corruption robustness test')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default='robustness.json')
    p.add_argument('--corruptions', nargs='+', default=['benchmark'],
                   help="'benchmark', 'all', or specific names")
    p.add_argument('--severities', type=int, nargs='+',
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--img-size', type=int, default=640)
    return p.parse_args()


def main():
    args = parse_args()

    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.corruptions import BENCHMARK_CORRUPTIONS, CORRUPTIONS
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    if args.corruptions == ['benchmark']:
        corruptions = BENCHMARK_CORRUPTIONS
    elif args.corruptions == ['all']:
        corruptions = sorted(CORRUPTIONS)
    else:
        corruptions = args.corruptions

    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)

    results = {}
    for corruption in corruptions:
        results[corruption] = {}
        for severity in args.severities:
            if severity == 0 and any(
                    0 in v for v in results.values() if v):
                # clean baseline is corruption-independent: reuse
                first = next(iter(results.values()))
                results[corruption][0] = first[0]
                continue
            data_cfg = copy.deepcopy(dict(cfg['data']['test']))
            pipeline = list(data_cfg['pipeline'])
            if severity > 0:
                pipeline.insert(1, dict(type='Corrupt',
                                        corruption=corruption,
                                        severity=severity))
            data_cfg['pipeline'] = pipeline
            dataset = build_dataset({**data_cfg, 'test_mode': True})
            dets = single_device_test(det.model, det.variables, dataset,
                                      batch_size=args.batch_size,
                                      img_size=args.img_size)
            anns = [dataset.get_ann_info_test(i)
                    for i in range(len(dataset))]
            report = coco_fast_bbox_eval(dets, anns,
                                         classes=dataset.CLASSES)
            results[corruption][severity] = report
            print(f'{corruption} severity {severity}: '
                  f"mAP {report.get('bbox_mAP', report)}")

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=2)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
