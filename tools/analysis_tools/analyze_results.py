#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Per-image result analysis (reference tools/analysis_tools/
analyze_results.py): score every image by its own mAP, save the best and
worst visualizations side by side with gt boxes."""
import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--show-dir', default='analysis_results')
    p.add_argument('--topk', type=int, default=20)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--score-thr', type=float, default=0.3)
    return p.parse_args()


def main():
    args = parse_args()
    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import eval_map_flexible
    from tpudet.visualization import imshow_det_bboxes

    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    dets = single_device_test(det.model, det.variables, dataset,
                              batch_size=args.batch_size,
                              img_size=args.img_size)
    anns = [dataset.get_ann_info_test(i) for i in range(len(dataset))]

    scores = []
    for i in range(len(dataset)):
        r = eval_map_flexible([dets[i]], [anns[i]],
                              iou_thrs=(0.5,), classes=dataset.CLASSES)
        scores.append(r['map'])
    order = np.argsort(scores)

    os.makedirs(os.path.join(args.show_dir, 'good'), exist_ok=True)
    os.makedirs(os.path.join(args.show_dir, 'bad'), exist_ok=True)
    k = min(args.topk, len(dataset))
    for rank, idx in enumerate(order[:k]):
        info = dataset.data_infos[idx]
        path = os.path.join(dataset.img_prefix, info['filename'])
        out = os.path.join(args.show_dir, 'bad',
                           f'{scores[idx]:.3f}_{info["filename"]}')
        imshow_det_bboxes(path, dets[idx], dataset.CLASSES,
                          score_thr=args.score_thr, out_file=out)
    for rank, idx in enumerate(order[::-1][:k]):
        info = dataset.data_infos[idx]
        path = os.path.join(dataset.img_prefix, info['filename'])
        out = os.path.join(args.show_dir, 'good',
                           f'{scores[idx]:.3f}_{info["filename"]}')
        imshow_det_bboxes(path, dets[idx], dataset.CLASSES,
                          score_thr=args.score_thr, out_file=out)
    print(f'saved {2 * k} visualizations under {args.show_dir}')


if __name__ == '__main__':
    main()
