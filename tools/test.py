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
    p.add_argument('--out', help='dump results json')
    return p.parse_args()


def main():
    args = parse_args()

    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    results = single_device_test(det.model, det.variables, dataset,
                                 batch_size=args.batch_size,
                                 img_size=args.img_size)
    annotations = [
        dataset.get_ann_info_test(i) for i in range(len(dataset))
    ]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=dataset.CLASSES)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f)


if __name__ == '__main__':
    main()
