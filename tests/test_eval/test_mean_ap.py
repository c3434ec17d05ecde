import numpy as np

from tpudet.evaluation.mean_ap import (average_precision, coco_fast_bbox_eval,
                                       eval_map_flexible, iou_coco,
                                       match_coco)


def make_anno(bboxes, labels, ignore=None, iscrowd=None, area=None):
    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels, np.int64)
    n = len(labels)
    attrs = dict(
        ignore=np.asarray(ignore if ignore is not None else [False] * n),
        iscrowd=np.asarray(iscrowd if iscrowd is not None else [False] * n),
        area=np.asarray(
            area if area is not None else
            (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1]),
            dtype=np.float32))
    return dict(gt_bboxes=bboxes, gt_labels=labels, gt_attrs=attrs)


def test_average_precision_known_values():
    # single det, correct: AP = 1
    rec = np.array([1.0])
    prec = np.array([1.0])
    np.testing.assert_allclose(average_precision(rec, prec), 1.0)
    # half recall at precision 1
    rec = np.array([0.5])
    prec = np.array([1.0])
    np.testing.assert_allclose(average_precision(rec, prec), 0.5)


def test_iou_coco_crowd_union():
    det = np.array([[0., 0., 10., 10.]], np.float32)
    gt = np.array([[0., 0., 20., 20.]], np.float32)
    iou_normal = iou_coco(det, gt, np.array([False]))
    np.testing.assert_allclose(iou_normal, [[100. / 400.]])
    # crowd: union = det area only -> fully-contained det has IoU 1
    iou_crowd = iou_coco(det, gt, np.array([True]))
    np.testing.assert_allclose(iou_crowd, [[1.0]])


def test_match_prefers_regular_over_ignored():
    # det overlaps an ignored gt more than a regular gt; regular must win
    iou = np.array([[0.9, 0.6]], np.float32)
    matched = match_coco(iou, np.array([0.5], np.float32),
                         is_ignore=np.array([True, False]),
                         is_crowd=np.array([False, False]))
    assert matched[0, 0] == 1


def test_match_gt_consumed_and_crowd_reusable():
    iou = np.array([[0.8, 0.0], [0.7, 0.0]], np.float32)
    matched = match_coco(iou, np.array([0.5], np.float32),
                         is_ignore=np.array([False, False]),
                         is_crowd=np.array([False, False]))
    # first (higher-score) det takes the gt; second is unmatched
    assert matched[0, 0] == 0 and matched[0, 1] == -1

    matched_crowd = match_coco(iou, np.array([0.5], np.float32),
                               is_ignore=np.array([False, False]),
                               is_crowd=np.array([True, False]))
    assert matched_crowd[0, 0] == 0 and matched_crowd[0, 1] == 0


def test_perfect_detection_map_is_one():
    gt = [[10, 10, 50, 50], [100, 100, 200, 180]]
    annotations = [make_anno(gt, [0, 1])]
    det = [
        np.array([[10, 10, 50, 50, 0.9]], np.float32),
        np.array([[100, 100, 200, 180, 0.8]], np.float32),
    ]
    report = eval_map_flexible([det], annotations,
                               iou_thrs=[0.5, 0.75],
                               classes=('a', 'b'))
    np.testing.assert_allclose(report['map'], 1.0)


def test_false_positive_lowers_precision():
    annotations = [make_anno([[10, 10, 50, 50]], [0])]
    det = [np.array([[10, 10, 50, 50, 0.9], [300, 300, 400, 400, 0.95]],
                    np.float32)]
    report = eval_map_flexible([det], annotations, iou_thrs=[0.5],
                               classes=('a',))
    # FP ranked first: precision at the TP is 1/2 -> AP = 0.5
    np.testing.assert_allclose(report['map'], 0.5)


def test_detection_on_ignored_gt_not_fp():
    annotations = [
        make_anno([[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0],
                  ignore=[False, True])
    ]
    det = [np.array([[10, 10, 50, 50, 0.8], [100, 100, 150, 150, 0.9]],
                    np.float32)]
    report = eval_map_flexible([det], annotations, iou_thrs=[0.5],
                               classes=('a',))
    # det on ignored gt is excluded entirely -> AP = 1
    np.testing.assert_allclose(report['map'], 1.0)


def test_fast_bbox_scale_breakdowns():
    # one small (16x16=256 < 32^2) and one large gt (200x200)
    annotations = [
        make_anno([[0, 0, 16, 16], [0, 0, 200, 200]], [0, 0])
    ]
    det = [np.array([[0, 0, 16, 16, 0.9], [0, 0, 200, 200, 0.8]],
                    np.float32)]
    report = coco_fast_bbox_eval([det], annotations, classes=('a',))
    np.testing.assert_allclose(report['map'], 1.0)
    np.testing.assert_allclose(report['map50'], 1.0)
    np.testing.assert_allclose(report['s_map'], 1.0)
    np.testing.assert_allclose(report['l_map'], 1.0)
    assert np.isnan(report['m_map'])  # no medium gts


def test_localization_quality_affects_high_iou_thresholds():
    annotations = [make_anno([[0, 0, 100, 100]], [0])]
    # det shifted: IoU ~ 0.68
    det = [np.array([[10, 10, 110, 110, 0.9]], np.float32)]
    r50 = eval_map_flexible([det], annotations, iou_thrs=[0.5],
                            classes=('a',))
    r75 = eval_map_flexible([det], annotations, iou_thrs=[0.75],
                            classes=('a',))
    np.testing.assert_allclose(r50['map'], 1.0)
    np.testing.assert_allclose(r75['map'], 0.0)


def test_match_best_only_semantics():
    from tpudet.evaluation.mean_ap import match_best_only
    # det0's best regular gt is gt1 (0.8); gt0 (0.6) would clear the
    # threshold but is NOT det0's best -> with gt1 taken, det0 matches
    # nothing regular
    iou = np.array([[0.6, 0.8],
                    [0.1, 0.9]], np.float32)
    ignore = np.array([False, False])
    crowd = np.array([False, False])
    m = match_best_only(iou, np.array([0.5], np.float32), ignore, crowd)
    # det0 first: best=0.8 at gt1 -> match gt1. det1: best=0.9 at gt1,
    # but gt1 taken -> unmatched (never falls back to gt0)
    assert m[0, 0] == 1 and m[0, 1] == -1

    # vs match_coco which lets det1 fall back to... also nothing (0.1<thr)
    # but a det with a non-best gt above thr stays unmatched:
    iou2 = np.array([[0.6, 0.8]], np.float32)
    m2 = match_best_only(iou2, np.array([0.5], np.float32),
                         np.array([False, False]),
                         np.array([False, False]))
    assert m2[0, 0] == 1
    # ignored match raises the single threshold variable (unlike
    # match_coco's separate regular/ignore thresholds) — reference
    # match_best_only.pyx quirk reproduced: the 0.6 regular gt cannot
    # displace the 0.7 ignored match
    iou3 = np.array([[0.7, 0.6]], np.float32)
    m3 = match_best_only(iou3, np.array([0.5], np.float32),
                         np.array([True, False]),  # gt0 ignored
                         np.array([False, False]))
    assert m3[0, 0] == 0
    # but a regular gt ABOVE the raised bar does displace it
    iou4 = np.array([[0.7, 0.8]], np.float32)
    m4 = match_best_only(iou4, np.array([0.5], np.float32),
                         np.array([True, False]),
                         np.array([False, False]))
    assert m4[0, 0] == 1


def test_more_det_classes_than_dataset_classes():
    # An 80-class head evaluated on a 1-class dataset: the reference drops
    # detections for classes beyond the dataset's cat_ids
    # (/root/reference/mmdet/datasets/coco.py:303-310); the evaluator must
    # clamp, not IndexError (regression: end-of-train eval with a config
    # whose head num_classes exceeds the dataset's class list).
    annotations = [make_anno([[10, 10, 50, 50]], [0])]
    det = [
        np.array([[10, 10, 50, 50, 0.9]], np.float32),  # class 0: perfect
        np.array([[0, 0, 5, 5, 0.8]], np.float32),      # class 1: dropped
        np.array([[0, 0, 5, 5, 0.7]], np.float32),      # class 2: dropped
    ]
    report = eval_map_flexible([det], annotations, iou_thrs=[0.5],
                               classes=('only',))
    np.testing.assert_allclose(report['map'], 1.0)
