#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Re-evaluate saved detection results against a dataset
(reference tools/analysis_tools/eval_metric.py)."""
import argparse
import json
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results', help='pickle of per-image per-class arrays')
    args = p.parse_args()

    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    cfg = Config.fromfile(args.config)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    assert len(results) == len(dataset), \
        f'{len(results)} results vs {len(dataset)} images'
    annotations = [dataset.get_ann_info_test(i) for i in range(len(dataset))]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=dataset.CLASSES)
    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    main()
