"""Dataset converters (reference tools/dataset_converters/): VOC XML and
Cityscapes instanceIds -> COCO json that loads through CocoDataset."""
import importlib.util
import json
import os.path as osp

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _load_tool(name, rel):
    spec = importlib.util.spec_from_file_location(name, osp.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pascal_voc_converter(tmp_path):
    voc = _load_tool('voc_cvt', 'tools/dataset_converters/pascal_voc.py')
    devkit = tmp_path / 'VOCdevkit'
    (devkit / 'VOC2007/ImageSets/Main').mkdir(parents=True)
    (devkit / 'VOC2007/Annotations').mkdir(parents=True)
    (devkit / 'VOC2007/JPEGImages').mkdir(parents=True)
    (devkit / 'VOC2007/ImageSets/Main/trainval.txt').write_text('im0\n')
    (devkit / 'VOC2007/Annotations/im0.xml').write_text("""
<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object>
    <name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax><ymax>61</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>""")
    coco = voc.convert(str(devkit), ['2007'], 'trainval')
    assert len(coco['images']) == 1
    assert coco['images'][0]['width'] == 100
    assert len(coco['annotations']) == 2
    dog = coco['annotations'][0]
    # 1-based inclusive VOC box -> 0-based xywh (reference -1 shift)
    assert dog['bbox'] == [10.0, 20.0, 40.0, 40.0]
    assert coco['categories'][dog['category_id'] - 1]['name'] == 'dog'
    assert dog['ignore'] == 0
    assert coco['annotations'][1]['ignore'] == 1  # difficult
    assert len(coco['categories']) == 20

    # the output must load through CocoDataset
    import cv2
    cv2.imwrite(str(devkit / 'VOC2007/JPEGImages/im0.jpg'),
                np.zeros((80, 100, 3), np.uint8))
    ann_path = tmp_path / 'voc.json'
    ann_path.write_text(json.dumps(coco))
    from tpudet.data.dataset import build_dataset
    ds = build_dataset(dict(
        type='CocoDataset', classes=voc.VOC_CLASSES,
        ann_file=str(ann_path), img_prefix=str(devkit),
        pipeline=[], test_mode=True))
    assert len(ds) == 1
    info = ds.get_ann_info_test(0)
    assert info['gt_bboxes'].shape == (2, 4)
    # the difficult instance rides through as an ignore region
    np.testing.assert_array_equal(info['gt_attrs']['ignore'],
                                  [False, True])


def test_cityscapes_converter(tmp_path):
    import cv2
    cs = _load_tool('cs_cvt', 'tools/dataset_converters/cityscapes.py')
    img_dir = tmp_path / 'leftImg8bit/train/city'
    gt_dir = tmp_path / 'gtFine/train/city'
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / 'f_leftImg8bit.png'),
                np.zeros((60, 90, 3), np.uint8))
    inst = np.zeros((60, 90), np.uint16)
    inst[5:25, 10:40] = 26000  # car instance 0 (labelId 26)
    inst[30:50, 50:80] = 24001  # person instance 1 (labelId 24)
    inst[0:4, 80:90] = 26  # bare labelId -> car group region (crowd)
    cv2.imwrite(str(gt_dir / 'f_gtFine_instanceIds.png'), inst)

    coco = cs.convert(str(tmp_path), 'leftImg8bit/train', 'gtFine/train')
    assert len(coco['images']) == 1
    assert coco['images'][0]['height'] == 60
    anns = coco['annotations']
    assert len(anns) == 3
    by_cat = sorted(anns, key=lambda a: (a['iscrowd'], a['category_id']))
    person, car, crowd = by_cat
    assert coco['categories'][person['category_id'] - 1]['name'] == 'person'
    assert coco['categories'][car['category_id'] - 1]['name'] == 'car'
    np.testing.assert_allclose(car['bbox'], [10, 5, 30, 20])
    np.testing.assert_allclose(person['bbox'], [50, 30, 30, 20])
    assert crowd['iscrowd'] == 1 and person['iscrowd'] == 0
    assert car['area'] == 600
    assert all(len(s) >= 6 for a in anns for s in a['segmentation'])
