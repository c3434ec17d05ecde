#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Visualize pipeline outputs (reference tools/misc/browse_dataset.py):
runs the train pipeline and writes annotated images to an output dir."""
import argparse
import os

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--output-dir', default='work_dirs/browse')
    p.add_argument('--num', type=int, default=20)
    args = p.parse_args()

    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg['data']['train'])
    os.makedirs(args.output_dir, exist_ok=True)
    norm = None
    for t in cfg['data']['train']['pipeline']:
        if t.get('type') == 'Normalize':
            norm = t
    for i in range(min(args.num, len(dataset))):
        sample = dataset[i]
        img = sample['img']
        if norm is not None and img.dtype != np.uint8:
            img = img * np.asarray(norm['std']) + np.asarray(norm['mean'])
            if norm.get('to_rgb'):
                img = img[..., ::-1]
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for box in sample.get('gt_bboxes', []):
            x1, y1, x2, y2 = (int(v) for v in box)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        out = os.path.join(args.output_dir, f'{i}.jpg')
        cv2.imwrite(out, img)
    print(f'wrote {min(args.num, len(dataset))} images to '
          f'{args.output_dir}')


if __name__ == '__main__':
    main()
