#!/usr/bin/env python
"""Synthetic 3-class shape dataset in COCO format (rect / circle /
triangle on a noise floor), for training-recipe proof runs and the
two-stack mAP A/B (tools/map_parity.py --checkpoint ...).

Real COCO is absent in this environment; unlike map_parity's
self-labeled protocol, this generator emits TRUE ground truth, so a
model trained on it has a realistic (non-degenerate) score surface and
an eval mAP that measures actual detection quality.

Usage:
    python tools/misc/synth_shapes.py OUTDIR --train 64 --val 32 --size 320
writes OUTDIR/{train,val}/images/*.jpg + OUTDIR/{train,val}.json.
"""
import argparse
import json
import os

import cv2
import numpy as np

CLASSES = ('rect', 'circle', 'triangle')


def draw_shape(img, cls, x, y, w, h, color):
    """Draw one filled shape; returns its tight bbox (x, y, w, h)."""
    if cls == 0:
        cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
    elif cls == 1:
        cx, cy = x + w // 2, y + h // 2
        cv2.ellipse(img, (cx, cy), (w // 2, h // 2), 0, 0, 360, color, -1)
    else:
        pts = np.array([[x + w // 2, y], [x, y + h], [x + w, y + h]])
        cv2.fillConvexPoly(img, pts, color)
    return x, y, w, h


def generate(out_dir, split, n, size, seed):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, split, 'images')
    os.makedirs(img_dir, exist_ok=True)
    images, anns, aid = [], [], 1
    for i in range(n):
        h_img = size if i % 2 else int(size * 0.75) // 32 * 32
        w_img = size
        img = (rng.rand(h_img, w_img, 3) * 60 + 40).astype(np.uint8)
        for _ in range(rng.randint(2, 7)):
            cls = rng.randint(3)
            w = rng.randint(size // 10, size // 3)
            hh = rng.randint(size // 10, size // 3)
            x = rng.randint(0, w_img - w)
            y = rng.randint(0, h_img - hh)
            color = tuple(int(c) for c in rng.randint(120, 256, 3))
            bx, by, bw, bh = draw_shape(img, cls, x, y, w, hh, color)
            anns.append(dict(id=aid, image_id=i + 1, category_id=cls + 1,
                             bbox=[float(bx), float(by), float(bw),
                                   float(bh)],
                             area=float(bw * bh), iscrowd=0))
            aid += 1
        name = f'{i:06d}.jpg'
        cv2.imwrite(os.path.join(img_dir, name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        images.append(dict(id=i + 1, file_name=name,
                           height=h_img, width=w_img))
    cats = [dict(id=c + 1, name=nm, supercategory='shape')
            for c, nm in enumerate(CLASSES)]
    ann_path = os.path.join(out_dir, f'{split}.json')
    with open(ann_path, 'w') as f:
        json.dump(dict(images=images, annotations=anns, categories=cats), f)
    print(f'{split}: {n} images / {len(anns)} boxes -> {ann_path}')
    return ann_path, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument('out_dir')
    p.add_argument('--train', type=int, default=64)
    p.add_argument('--val', type=int, default=32)
    p.add_argument('--size', type=int, default=320)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()
    generate(args.out_dir, 'train', args.train, args.size, args.seed)
    generate(args.out_dir, 'val', args.val, args.size, args.seed + 1)


if __name__ == '__main__':
    main()
