#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Convert a PASCAL VOC devkit's XML annotations to COCO-format json
(reference tools/dataset_converters/pascal_voc.py — same semantics:
1-based VOC pixel coords shifted to 0-based, ``difficult`` objects kept
as ignore regions).

The output json loads with ``CocoDataset`` (tpudet/data/dataset.py);
``VOCDataset`` can also read the XML tree directly — this converter is
for pipelines standardized on COCO json.

Usage:
    python tools/dataset_converters/pascal_voc.py DEVKIT_DIR \
        --years 2007 2012 --split trainval --out voc_trainval.json
"""
import argparse
import json
import os.path as osp
import xml.etree.ElementTree as ET

VOC_CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


def parse_xml(xml_path, img_rel_path):
    """One image's VOC XML -> (image_dict_fields, [instance dicts]).

    VOC boxes are 1-based inclusive pixel coords; like the reference
    (pascal_voc.py:45-52) they are shifted by -1 to 0-based, and
    ``difficult`` instances are flagged ignore."""
    root = ET.parse(xml_path).getroot()
    size = root.find('size')
    w = int(size.find('width').text)
    h = int(size.find('height').text)
    instances = []
    for obj in root.findall('object'):
        name = obj.find('name').text
        if name not in VOC_CLASSES:
            continue
        difficult = int((obj.find('difficult') is not None
                         and obj.find('difficult').text) or 0)
        bnd = obj.find('bndbox')
        x1 = float(bnd.find('xmin').text) - 1
        y1 = float(bnd.find('ymin').text) - 1
        x2 = float(bnd.find('xmax').text) - 1
        y2 = float(bnd.find('ymax').text) - 1
        instances.append(dict(
            category_id=VOC_CLASSES.index(name) + 1,
            bbox=[x1, y1, x2 - x1, y2 - y1],
            area=(x2 - x1) * (y2 - y1),
            iscrowd=0,
            ignore=int(difficult)))
    return dict(file_name=img_rel_path, width=w, height=h), instances


def convert(devkit_path, years, split):
    """Walk ImageSets/Main/<split>.txt for each year; returns a
    COCO-format dict."""
    images, annotations = [], []
    img_id, ann_id = 0, 0
    for year in years:
        filelist = osp.join(devkit_path,
                            f'VOC{year}/ImageSets/Main/{split}.txt')
        if not osp.isfile(filelist):
            print(f'filelist does not exist: {filelist}, '
                  f'skip voc{year} {split}')
            continue
        with open(filelist) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        for name in names:
            xml_path = osp.join(devkit_path,
                                f'VOC{year}/Annotations/{name}.xml')
            img_rel = f'VOC{year}/JPEGImages/{name}.jpg'
            image, instances = parse_xml(xml_path, img_rel)
            img_id += 1
            image['id'] = img_id
            images.append(image)
            for inst in instances:
                ann_id += 1
                inst.update(id=ann_id, image_id=img_id)
                annotations.append(inst)
    categories = [dict(id=i + 1, name=c, supercategory='none')
                  for i, c in enumerate(VOC_CLASSES)]
    return dict(images=images, annotations=annotations,
                categories=categories, type='instance')


def main():
    p = argparse.ArgumentParser(
        description='Convert PASCAL VOC annotations to COCO json')
    p.add_argument('devkit_path', help='VOCdevkit root')
    p.add_argument('--years', nargs='+', default=['2007', '2012'])
    p.add_argument('--split', default='trainval',
                   help='ImageSets/Main list name (train/val/trainval/test)')
    p.add_argument('--out', required=True, help='output json path')
    args = p.parse_args()
    coco = convert(args.devkit_path, args.years, args.split)
    with open(args.out, 'w') as f:
        json.dump(coco, f)
    print(f'wrote {len(coco["images"])} images / '
          f'{len(coco["annotations"])} instances to {args.out}')


if __name__ == '__main__':
    main()
