"""Sanity of the shim's pure-numpy COCOeval (the evaluator behind the
reference's metric='bbox' flow in the two-stack mAP A/B): hand-computed
cases + agreement with tpudet's independent fast-bbox evaluator (itself
parity-pinned to the reference's eval_map in test_eval_parity)."""
import numpy as np
import pytest

from . import refbridge


def _coco_gt(images, annotations, n_classes=2):
    from pycocotools.coco import COCO
    gt = COCO()
    gt.dataset = dict(
        images=images, annotations=annotations,
        categories=[dict(id=c + 1, name=f'c{c}')
                    for c in range(n_classes)])
    gt.createIndex()
    return gt


def _run_cocoeval(gt, dets):
    from pycocotools.cocoeval import COCOeval
    dt = gt.loadRes(dets)
    e = COCOeval(gt, dt, 'bbox')
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e.stats


def test_perfect_single_detection():
    refbridge.setup()
    gt = _coco_gt(
        [dict(id=1, file_name='a.jpg', width=100, height=100)],
        [dict(id=1, image_id=1, bbox=[10., 10., 40., 40.], area=1600.,
              iscrowd=0, category_id=1)])
    stats = _run_cocoeval(gt, [dict(image_id=1, category_id=1,
                                    bbox=[10., 10., 40., 40.], score=0.9)])
    assert stats[0] == pytest.approx(1.0)   # mAP
    assert stats[1] == pytest.approx(1.0)   # mAP50


def test_half_iou_detection_counts_only_at_50():
    """IoU ~0.52 det: TP at 0.5 threshold, FP at >=0.55 -> mAP = 1/10."""
    refbridge.setup()
    gt = _coco_gt(
        [dict(id=1, file_name='a.jpg', width=200, height=200)],
        [dict(id=1, image_id=1, bbox=[0., 0., 100., 100.], area=10000.,
              iscrowd=0, category_id=1)])
    # shift by 31px: inter = 69*100, union = 2*10000 - 6900 -> IoU 0.527
    stats = _run_cocoeval(gt, [dict(image_id=1, category_id=1,
                                    bbox=[31., 0., 100., 100.],
                                    score=0.9)])
    assert stats[1] == pytest.approx(1.0)           # AP50 = 1
    assert stats[2] == pytest.approx(0.0)           # AP75 = 0
    assert stats[0] == pytest.approx(0.1)           # one of ten thresholds


def test_crowd_gt_absorbs_duplicates_without_fp():
    """A crowd gt matches any number of dets (det-area union) and the
    matches are ignored, not TPs or FPs."""
    refbridge.setup()
    gt = _coco_gt(
        [dict(id=1, file_name='a.jpg', width=200, height=200)],
        [dict(id=1, image_id=1, bbox=[0., 0., 100., 100.], area=10000.,
              iscrowd=1, category_id=1),
         dict(id=2, image_id=1, bbox=[120., 120., 50., 50.], area=2500.,
              iscrowd=0, category_id=1)])
    dets = [
        dict(image_id=1, category_id=1, bbox=[120., 120., 50., 50.],
             score=0.95),                                     # TP
        dict(image_id=1, category_id=1, bbox=[10., 10., 30., 30.],
             score=0.9),   # inside crowd -> ignored, not FP
        dict(image_id=1, category_id=1, bbox=[50., 50., 30., 30.],
             score=0.8),   # also inside crowd -> ignored
    ]
    stats = _run_cocoeval(gt, dets)
    assert stats[0] == pytest.approx(1.0)


def test_shim_cocoeval_agrees_with_tpudet_evaluator():
    """Random dense scenario: the shim COCOeval and tpudet's fast-bbox
    evaluator are INDEPENDENT implementations of the COCO protocol; their
    overall mAP/mAP50/mAP75 must agree."""
    refbridge.setup()
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    rng = np.random.RandomState(3)
    n_img, n_cls = 12, 3
    images, gt_anns = [], []
    det_results = []   # tpudet format: per image per class (n, 5) xyxy
    coco_dets = []     # COCO format xywh
    ann_id = 1
    for i in range(n_img):
        w = h = 200
        images.append(dict(id=i + 1, file_name=f'{i}.jpg', width=w,
                           height=h))
        boxes, labels = [], []
        for _ in range(rng.randint(1, 6)):
            bw, bh = rng.randint(15, 80, 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            c = rng.randint(0, n_cls)
            gt_anns.append(dict(id=ann_id, image_id=i + 1,
                                bbox=[float(x), float(y), float(bw),
                                      float(bh)],
                                area=float(bw * bh), iscrowd=0,
                                category_id=c + 1))
            ann_id += 1
            boxes.append([x, y, x + bw, y + bh])
            labels.append(c)
        boxes = np.asarray(boxes, np.float32)
        labels = np.asarray(labels, np.int64)

        per_class = []
        for c in range(n_cls):
            dets = []
            for b, l in zip(boxes, labels):
                if l != c:
                    continue
                # jittered copy of the gt + score
                jit = b + rng.randn(4) * rng.choice([1., 5., 15.])
                score = float(rng.rand() * 0.8 + 0.1)
                dets.append(np.r_[jit, score])
            for _ in range(rng.randint(0, 3)):   # pure noise dets
                bw, bh = rng.randint(10, 60, 2)
                x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
                dets.append(np.array(
                    [x, y, x + bw, y + bh, rng.rand() * 0.5]))
            arr = (np.stack(dets) if dets
                   else np.zeros((0, 5), np.float32)).astype(np.float32)
            per_class.append(arr)
            for row in arr:
                coco_dets.append(dict(
                    image_id=i + 1, category_id=c + 1,
                    bbox=[float(row[0]), float(row[1]),
                          float(row[2] - row[0]), float(row[3] - row[1])],
                    score=float(row[4])))
        det_results.append(per_class)

    gt = _coco_gt(images, gt_anns, n_classes=n_cls)
    stats = _run_cocoeval(gt, coco_dets)

    annotations = []
    for i in range(n_img):
        b = [a for a in gt_anns if a['image_id'] == i + 1]
        bboxes = np.array([[a['bbox'][0], a['bbox'][1],
                            a['bbox'][0] + a['bbox'][2],
                            a['bbox'][1] + a['bbox'][3]] for a in b],
                          np.float32)
        labels_ = np.array([a['category_id'] - 1 for a in b], np.int64)
        annotations.append(dict(
            gt_bboxes=bboxes, gt_labels=labels_, img_shape=(200, 200),
            gt_attrs=dict(iscrowd=np.zeros(len(b), bool),
                          ignore=np.zeros(len(b), bool),
                          area=np.array([a['area'] for a in b],
                                        np.float32))))
    report = coco_fast_bbox_eval(det_results, annotations,
                                 classes=[f'c{c}' for c in range(n_cls)])
    # The two protocols differ by construction in AP integration:
    # fast-bbox uses continuous area under PR (the reference's
    # mean_ap_flexible.py:219 -> mean_ap.py average_precision mode='area')
    # while COCOeval samples 101 interpolated recall points. That gap is
    # small and bounded; everything else (matching, crowd, ignore,
    # ranking) must agree.
    assert report['map'] == pytest.approx(stats[0], abs=5e-3)
    assert report['map50'] == pytest.approx(stats[1], abs=5e-3)
    assert report['map75'] == pytest.approx(stats[2], abs=5e-3)
