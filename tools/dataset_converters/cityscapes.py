#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Convert Cityscapes gtFine instance annotations to COCO-format json
(reference tools/dataset_converters/cityscapes.py, minus the
cityscapesscripts/pycocotools dependencies: the 8 instance classes and the
instanceIds encoding are reproduced directly, masks become polygon
segmentations via cv2 contours).

Cityscapes encodes instances in ``*_gtFine_instanceIds.png``:
pixel value = labelId * 1000 + instance_index for real instances, or the
bare labelId for "group" regions (labelId < 1000 in the png) — group
regions become ``iscrowd=1`` annotations, matching cityscapesscripts'
``instances2dict`` + the reference's crowd handling.

Usage:
    python tools/dataset_converters/cityscapes.py CITYSCAPES_ROOT \
        --img-dir leftImg8bit/train --gt-dir gtFine/train \
        --out train.json
"""
import argparse
import glob
import json
import os.path as osp

import numpy as np

# the 8 hasInstances classes and their Cityscapes labelIds
# (cityscapesscripts/helpers/labels.py is the public source of this table)
CITYSCAPES_CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
                      'motorcycle', 'bicycle')
CITYSCAPES_LABEL_IDS = (24, 25, 26, 27, 28, 31, 32, 33)


def collect_files(img_dir, gt_dir):
    suffix = 'leftImg8bit.png'
    files = []
    for img_file in sorted(
            glob.glob(osp.join(img_dir, '**/*.png'), recursive=True)):
        assert img_file.endswith(suffix), img_file
        inst_file = gt_dir + img_file[len(img_dir):-len(suffix)] + \
            'gtFine_instanceIds.png'
        files.append((img_file, inst_file))
    assert files, f'No images found in {img_dir}'
    return files


def mask_to_annotation(mask, category_id, iscrowd):
    """Binary mask -> COCO polygon annotation fields (bbox xywh, area,
    segmentation). Crowd regions keep polygon segmentation too (the
    flexible evaluator rasterizes polygons; RLE is not needed)."""
    import cv2
    ys, xs = np.where(mask)
    x1, y1 = float(xs.min()), float(ys.min())
    x2, y2 = float(xs.max()) + 1, float(ys.max()) + 1
    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    segmentation = []
    for c in contours:
        c = c.reshape(-1, 2)
        if len(c) >= 3:
            segmentation.append([float(v) for v in c.reshape(-1)])
    if not segmentation:
        return None
    return dict(bbox=[x1, y1, x2 - x1, y2 - y1],
                area=float(mask.sum()),
                segmentation=segmentation,
                category_id=category_id,
                iscrowd=iscrowd)


def convert_image(inst_file, inst_img=None):
    """One instanceIds png -> list of COCO instance dicts."""
    if inst_img is None:
        import cv2
        inst_img = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
    assert inst_img is not None, f'cannot read {inst_file}'
    anns = []
    for inst_id in np.unique(inst_img):
        label_id = inst_id // 1000 if inst_id >= 1000 else inst_id
        if label_id not in CITYSCAPES_LABEL_IDS:
            continue
        category_id = CITYSCAPES_LABEL_IDS.index(int(label_id)) + 1
        iscrowd = int(inst_id < 1000)  # bare labelId == group region
        ann = mask_to_annotation(inst_img == inst_id, category_id, iscrowd)
        if ann is not None:
            anns.append(ann)
    return anns


def convert(root, img_dir, gt_dir):
    images, annotations = [], []
    ann_id = 0
    files = collect_files(osp.join(root, img_dir), osp.join(root, gt_dir))
    print(f'Loaded {len(files)} images from {img_dir}')
    for img_id, (img_file, inst_file) in enumerate(files, 1):
        import cv2
        # read the (large 16-bit) instance png once: shape for the image
        # record, pixels for the annotation extraction
        inst_img = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
        assert inst_img is not None, f'cannot read {inst_file}'
        h, w = inst_img.shape[:2]
        images.append(dict(id=img_id, width=w, height=h,
                           file_name=osp.relpath(img_file,
                                                 osp.join(root, img_dir))))
        for ann in convert_image(inst_file, inst_img=inst_img):
            ann_id += 1
            ann.update(id=ann_id, image_id=img_id)
            annotations.append(ann)
    categories = [dict(id=i + 1, name=c)
                  for i, c in enumerate(CITYSCAPES_CLASSES)]
    return dict(images=images, annotations=annotations,
                categories=categories)


def main():
    p = argparse.ArgumentParser(
        description='Convert Cityscapes gtFine to COCO json')
    p.add_argument('cityscapes_path', help='dataset root')
    p.add_argument('--img-dir', default='leftImg8bit/train')
    p.add_argument('--gt-dir', default='gtFine/train')
    p.add_argument('--out', required=True)
    args = p.parse_args()
    coco = convert(args.cityscapes_path, args.img_dir, args.gt_dir)
    with open(args.out, 'w') as f:
        json.dump(coco, f)
    print(f'wrote {len(coco["images"])} images / '
          f'{len(coco["annotations"])} instances to {args.out}')


if __name__ == '__main__':
    main()
