import json
import os

import cv2
import numpy as np
import pytest

from tpudet.data.dataset import CocoDataset
from tpudet.data.loader import DetDataLoader
from tpudet.data.pipelines import (Compose, GtBBoxesFilter, Normalize, Pad,
                                   Resize, rescale_size)


@pytest.fixture(scope='module')
def tiny_coco(tmp_path_factory):
    """Synthetic 6-image COCO dataset on disk."""
    root = tmp_path_factory.mktemp('coco')
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    sizes = [(120, 160), (160, 120), (96, 128), (128, 96), (100, 100),
             (140, 150)]
    for i, (h, w) in enumerate(sizes):
        fn = f'img{i}.jpg'
        cv2.imwrite(str(root / fn),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append(dict(id=i + 1, file_name=fn, width=w, height=h))
        for _ in range(int(rng.randint(1, 4))):
            bw = int(rng.randint(10, w // 2))
            bh = int(rng.randint(10, h // 2))
            x = int(rng.randint(0, w - bw))
            y = int(rng.randint(0, h - bh))
            annotations.append(
                dict(id=ann_id, image_id=i + 1,
                     bbox=[float(x), float(y), float(bw), float(bh)],
                     area=float(bw * bh), iscrowd=0,
                     category_id=int(rng.choice([1, 2, 3]))))
            ann_id += 1
    categories = [dict(id=1, name='cat'), dict(id=2, name='dog'),
                  dict(id=3, name='bird')]
    ann_file = root / 'ann.json'
    with open(ann_file, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    return str(ann_file), str(root)


def test_rescale_size_letterbox():
    # 120x160 image to (640, 640): factor 4 -> 480x640
    assert rescale_size(120, 160, (640, 640)) == (640, 480)
    assert rescale_size(160, 120, (640, 640)) == (480, 640)


def test_basic_pipeline(tiny_coco):
    ann_file, root = tiny_coco
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
        dict(type='Pad', size_divisor=32),
        dict(type='Normalize', mean=[114, 114, 114], std=[255, 255, 255],
             to_rgb=True),
    ]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root)
    assert len(ds) == 6
    sample = ds[0]
    h, w = sample['img'].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert sample['img'].dtype == np.float32
    # normalized range
    assert abs(sample['img']).max() <= (255 - 0) / 255 + 0.5
    assert len(sample['gt_bboxes']) == len(sample['gt_labels'])
    assert (sample['gt_bboxes'][:, 2] <= w).all()


def test_mosaic_pipeline(tiny_coco):
    ann_file, root = tiny_coco
    pipeline = [
        dict(type='MosaicPipeline',
             individual_pipeline=[
                 dict(type='LoadImageFromFile'),
                 dict(type='LoadAnnotations', with_bbox=True),
                 dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
             ],
             pad_val=114),
        dict(type='GtBBoxesFilter', min_size=2, max_aspect_ratio=20),
    ]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root)
    s = ds[0]
    h, w = s['img'].shape[:2]
    assert h == w and h % 2 == 0 and 64 <= h <= 128
    # boxes inside canvas
    assert (s['gt_bboxes'] >= 0).all()
    assert (s['gt_bboxes'][:, 2] <= w + 1).all()


def test_random_affine_chain(tiny_coco):
    ann_file, root = tiny_coco
    pipeline = [
        dict(type='MosaicPipeline',
             individual_pipeline=[
                 dict(type='LoadImageFromFile'),
                 dict(type='LoadAnnotations', with_bbox=True),
                 dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
             ],
             pad_val=114),
        dict(type='RandomAffineChain', pad_to=192, crop=128, scale_limit=0.5,
             out=64, pad_val=114),
        dict(type='HueSaturationValueJitter', hue_ratio=0.015,
             saturation_ratio=0.7, value_ratio=0.4),
        dict(type='GtBBoxesFilter', min_size=2, max_aspect_ratio=20),
        dict(type='Normalize', mean=[114, 114, 114], std=[255, 255, 255]),
    ]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root)
    s = ds[1]
    assert s['img'].shape == (64, 64, 3)
    if len(s['gt_bboxes']):
        assert (s['gt_bboxes'] >= 0).all()
        assert (s['gt_bboxes'][:, 2:] <= 64).all()


def test_loader_padded_batches(tiny_coco):
    ann_file, root = tiny_coco
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
        dict(type='Pad', size_divisor=32),
        dict(type='Normalize', mean=[114, 114, 114], std=[255, 255, 255]),
    ]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root)
    loader = DetDataLoader(ds, batch_size=2, max_gts=10, img_size=64,
                           seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b['img'].shape == (2, 64, 64, 3)
    assert b['gt_bboxes'].shape == (2, 10, 4)
    assert b['gt_valid'].shape == (2, 10)
    assert b['gt_valid'].sum() > 0
    # padded slots are zero
    assert (b['gt_bboxes'][~b['gt_valid']] == 0).all()

    # multi-host sharding covers disjoint indices
    l0 = DetDataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                       process_count=2, img_size=64)
    l1 = DetDataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                       process_count=2, img_size=64)
    idx0 = {m['_idx'] for batch in l0 for m in batch['img_metas']}
    idx1 = {m['_idx'] for batch in l1 for m in batch['img_metas']}
    assert idx0.isdisjoint(idx1)
    assert len(idx0 | idx1) == 6


def test_loader_propagates_worker_exception(tiny_coco):
    """A crashing pipeline must raise in the consumer, not deadlock the
    training loop on q.get (the prefetch worker is a daemon thread)."""
    import pytest

    ann_file, root = tiny_coco
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
    ]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root)
    # canvas smaller than the pipeline output -> collate broadcast error
    loader = DetDataLoader(ds, batch_size=2, max_gts=10, img_size=16)
    with pytest.raises(ValueError):
        list(loader)


def test_gt_bboxes_filter():
    f = GtBBoxesFilter(min_size=2, max_aspect_ratio=20)
    results = dict(
        gt_bboxes=np.array([[0, 0, 10, 10], [0, 0, 1, 50], [0, 0, 100, 2],
                            [5, 5, 50, 6.5]], np.float32),
        gt_labels=np.array([0, 1, 2, 3]))
    out = f(results)
    # box1: w=1 too small; box2: h=2 not > min_size... h==2 fails (>2 req.)
    assert out['gt_labels'].tolist() == [0]


def test_eval_annotations(tiny_coco):
    ann_file, root = tiny_coco
    ds = CocoDataset(ann_file, [dict(type='LoadImageFromFile')],
                     img_prefix=root, test_mode=True)
    ann = ds.get_ann_info_test(0)
    assert set(ann['gt_attrs']) == {'ignore', 'iscrowd', 'area'}
    assert ann['gt_bboxes'].shape[1] == 4


def test_results2json_interchange(tiny_coco, tmp_path):
    """COCO-result interchange dump (reference coco.py:265-310
    results2json): original category ids, xywh boxes, RLE segm."""
    import json

    ann_file, root = tiny_coco
    pipeline = [dict(type='LoadImageFromFile')]
    ds = CocoDataset(ann_file, pipeline, img_prefix=root, test_mode=True)
    nc = len(ds.CLASSES)
    results, segms = [], []
    for i in range(len(ds)):
        per_cls = [np.zeros((0, 5), np.float32) for _ in range(nc)]
        per_cls_segm = [[] for _ in range(nc)]
        per_cls[0] = np.array([[10., 20., 30., 60., 0.9]], np.float32)
        per_cls_segm[0] = [dict(size=[64, 64], counts=[10, 5, 4081])]
        results.append(per_cls)
        segms.append(per_cls_segm)
    paths = ds.results2json(results, str(tmp_path / 'res'),
                            segm_results=segms)
    dets = json.load(open(paths['bbox']))
    assert len(dets) == len(ds)
    d = dets[0]
    assert d['image_id'] == ds.img_ids[0]
    assert d['category_id'] == ds.cat_ids[0]
    assert d['bbox'] == [10., 20., 20., 40.]  # xyxy -> xywh
    assert d['score'] == pytest.approx(0.9)
    seg = json.load(open(paths['segm']))
    assert seg[0]['segmentation']['counts'] == [10, 5, 4081]
    assert seg[0]['bbox'] == d['bbox']


def test_resize_multiscale_modes():
    """Multi-scale training Resize (reference transforms.py:100-140
    random_select/random_sample): 'value' picks one of the listed
    scales per sample; 'range' samples each edge between the two
    bounds. Both keep_ratio-rescale within the picked scale and record
    a consistent (w, h, w, h) scale_factor."""
    import random as _random

    from tpudet.data.pipelines import Resize

    scales = [(1333, 640), (1333, 672), (1333, 704)]
    r = Resize(img_scale=scales, multiscale_mode='value')
    _random.seed(0)
    seen = set()
    for _ in range(24):
        out = r(dict(img=np.zeros((480, 640, 3), np.uint8),
                     bbox_fields=[]))
        h, w = out['img'].shape[:2]
        # the rescaled long/short edges fit one of the listed scales
        long_edges = {s[0] for s in scales}
        short_edges = {s[1] for s in scales}
        assert max(h, w) <= max(long_edges)
        assert min(h, w) in short_edges or max(h, w) in long_edges
        seen.add((h, w))
        sf = out['scale_factor']
        np.testing.assert_allclose(sf[0], w / 640, rtol=1e-6)
        np.testing.assert_allclose(sf[1], h / 480, rtol=1e-6)
    assert len(seen) > 1, 'value mode never varied the scale'

    r = Resize(img_scale=[(1333, 480), (1333, 800)],
               multiscale_mode='range')
    _random.seed(1)
    shorts = set()
    for _ in range(24):
        out = r(dict(img=np.zeros((500, 500, 3), np.uint8),
                     bbox_fields=[]))
        h, w = out['img'].shape[:2]
        assert 480 - 1 <= min(h, w) <= 800 + 1
        shorts.add(min(h, w))
    assert len(shorts) > 4, 'range mode did not sample a spread'

    # single-scale behavior unchanged
    r = Resize(img_scale=(640, 640))
    out = r(dict(img=np.zeros((480, 640, 3), np.uint8), bbox_fields=[]))
    assert out['img'].shape[:2] == (480, 640)

    # an explicit results['scale'] (MultiScaleFlipAug) still wins
    r = Resize(img_scale=scales, multiscale_mode='value')
    out = r(dict(img=np.zeros((480, 640, 3), np.uint8), bbox_fields=[],
                 scale=(320, 320)))
    assert max(out['img'].shape[:2]) <= 320
