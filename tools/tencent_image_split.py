#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Offline tile-splitting preprocessor (reference tencent_image_split.py):
split huge annotated images into overlapping crops with bbox remapping,
dropping boxes whose visible fraction in a crop is too small.
"""
import argparse
import glob
import os
import os.path as osp
from multiprocessing import Pool

import cv2
import numpy as np


def split_one(task):
    img_path, ann_path, out_dir, tile, overlap, min_vis = task
    img = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if img is None:
        return 0
    h, w = img.shape[:2]
    boxes = []
    if ann_path and osp.exists(ann_path):
        with open(ann_path) as f:
            for line in f:
                vals = [float(v) for v in line.strip().split(',') if v]
                if len(vals) >= 4:
                    boxes.append(vals[:4])
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    stem = osp.splitext(osp.basename(img_path))[0]
    stride = tile - overlap
    count = 0
    for y0 in range(0, max(h - overlap, 1), stride):
        for x0 in range(0, max(w - overlap, 1), stride):
            x1 = min(x0 + tile, w)
            y1 = min(y0 + tile, h)
            crop = img[y0:y1, x0:x1]
            if boxes.size:
                shifted = boxes - [x0, y0, x0, y0]
                clipped = shifted.copy()
                clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, x1 - x0)
                clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, y1 - y0)
                area = ((clipped[:, 2] - clipped[:, 0]) *
                        (clipped[:, 3] - clipped[:, 1]))
                full = ((shifted[:, 2] - shifted[:, 0]) *
                        (shifted[:, 3] - shifted[:, 1]))
                keep = area / np.maximum(full, 1e-6) >= min_vis
                kept = clipped[keep]
            else:
                kept = boxes
            name = f'{stem}_{x0}_{y0}'
            cv2.imwrite(osp.join(out_dir, name + '.jpg'), crop)
            with open(osp.join(out_dir, name + '.circle'), 'w') as f:
                for b in kept:
                    f.write(','.join(f'{v:.1f}' for v in b) + '\n')
            count += 1
    return count


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src_dir', help='folder with .jpg images + .circle anns')
    p.add_argument('out_dir')
    p.add_argument('--tile', type=int, default=1280)
    p.add_argument('--overlap', type=int, default=256)
    p.add_argument('--min-visibility', type=float, default=0.5)
    p.add_argument('--nproc', type=int, default=4)
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    tasks = []
    for img in sorted(glob.glob(osp.join(args.src_dir, '*.jpg'))):
        ann = osp.splitext(img)[0] + '.circle'
        tasks.append((img, ann if osp.exists(ann) else None, args.out_dir,
                      args.tile, args.overlap, args.min_visibility))
    with Pool(args.nproc) as pool:
        counts = pool.map(split_one, tasks)
    print(f'split {len(tasks)} images into {sum(counts)} tiles')


if __name__ == '__main__':
    main()
