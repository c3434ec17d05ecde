"""Instance-segmentation eval surface: RLE codec, mask IoU (crowd
semantics), mask pasting, and segm mAP with known-answer oracles.

Reference parity targets: mmdet/datasets/coco.py:412-464 metric='segm',
mmdet/core/mask/utils.py encode_mask_results,
mmdet/models/roi_heads/mask_heads/fcn_mask_head.py get_seg_masks.
"""
import numpy as np

from tpudet.core.mask import (decode_rle, encode_rle, mask_iou_matrix,
                              paste_mask_probs, rle_area,
                              segmentation_to_bitmap)
from tpudet.evaluation.mean_ap import coco_fast_segm_eval


def test_rle_roundtrip():
    rng = np.random.RandomState(3)
    for _ in range(10):
        m = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        rle = encode_rle(m)
        assert rle['size'] == [23, 31]
        np.testing.assert_array_equal(decode_rle(rle), m)
        assert rle_area(rle) == int(m.sum())
    # empty + full masks
    z = np.zeros((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(z)), z)
    o = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(encode_rle(o)), o)


def test_mask_iou_crowd_semantics():
    a = np.zeros((10, 10), np.uint8)
    a[:5, :] = 1  # area 50
    b = np.zeros((10, 10), np.uint8)
    b[:, :] = 1  # area 100, contains a
    # non-crowd: IoU = 50/100
    iou = mask_iou_matrix([a], [b])
    np.testing.assert_allclose(iou, [[0.5]])
    # crowd gt: union = det area -> IoF = 50/50 = 1
    iou = mask_iou_matrix([a], [b], np.array([True]))
    np.testing.assert_allclose(iou, [[1.0]])
    # RLE inputs work too
    iou = mask_iou_matrix([encode_rle(a)], [encode_rle(b)])
    np.testing.assert_allclose(iou, [[0.5]])


def test_paste_mask_probs_geometry():
    probs = np.ones((1, 4, 4), np.float32)
    boxes = np.array([[10.0, 20.0, 30.0, 50.0]])
    out = paste_mask_probs(probs, boxes, 60, 60, thr=0.5)
    assert out.shape == (1, 60, 60)
    assert out[0, 25, 15] == 1
    assert out[0, 10, 15] == 0  # above the box
    assert out[0, 25, 35] == 0  # right of the box
    # probabilities below threshold produce nothing
    out = paste_mask_probs(probs * 0.3, boxes, 60, 60, thr=0.5)
    assert out.sum() == 0


def test_segmentation_to_bitmap_polygon():
    poly = [[2, 2, 8, 2, 8, 8, 2, 8]]  # square
    m = segmentation_to_bitmap(poly, 10, 10)
    assert m[5, 5] == 1 and m[0, 0] == 0
    # RLE passthrough
    rle = encode_rle(m)
    np.testing.assert_array_equal(segmentation_to_bitmap(rle, 10, 10), m)


def _ann(gt_boxes, labels, masks, hw=(64, 64)):
    n = len(gt_boxes)
    return dict(
        gt_bboxes=np.asarray(gt_boxes, np.float32),
        gt_labels=np.asarray(labels, np.int64),
        gt_masks=list(masks),
        img_shape=hw,
        gt_attrs=dict(ignore=np.zeros(n, bool),
                      iscrowd=np.zeros(n, bool),
                      area=np.asarray([
                          (b[2] - b[0]) * (b[3] - b[1]) for b in gt_boxes
                      ], np.float32)))


def _square_mask(x1, y1, x2, y2, hw=(64, 64)):
    m = np.zeros(hw, np.uint8)
    m[int(y1):int(y2), int(x1):int(x2)] = 1
    return m


def test_segm_map_perfect_predictions():
    """Detections whose masks exactly equal the gt masks -> mAP 1.0
    even when the BOXES are wrong (segm metric matches on masks)."""
    gt_box = [8, 8, 40, 40]
    gt_mask = encode_rle(_square_mask(8, 8, 40, 40))
    anns = [_ann([gt_box], [0], [gt_mask])]
    # deliberately shifted box, perfect mask
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    segms = [[[gt_mask]]]
    rep = coco_fast_segm_eval(dets, segms, anns, classes=['a'])
    assert rep['segm_map'] > 0.99
    assert rep['segm_map75'] > 0.99


def test_segm_map_half_overlap():
    """A mask overlapping gt by IoU ~0.5 scores at IoU<=0.5 thresholds
    only -> mAP averages to ~1/10 over .5:.95 (only the .50 threshold
    can match; IoU=0.5 < 0.55)."""
    gt_mask = encode_rle(_square_mask(0, 0, 32, 32))
    anns = [_ann([[0, 0, 32, 32]], [0], [gt_mask])]
    # det mask shifted to overlap 512/1536 ... build IoU exactly 0.5:
    # det = rows 0:32, cols 16:48 -> inter 512, union 1536 -> 1/3.
    # Use cols 8:40 -> inter 768, union 1280 -> 0.6 (matches @.5 and .55
    # and .6)
    det_mask = encode_rle(_square_mask(8, 0, 40, 32))
    dets = [[np.array([[8, 0, 40, 32, 0.9]], np.float32)]]
    segms = [[[det_mask]]]
    rep = coco_fast_segm_eval(dets, segms, anns, classes=['a'])
    # matched at thresholds .5, .55, .6 -> 3/10
    np.testing.assert_allclose(rep['segm_map'], 0.3, atol=1e-6)
    assert rep['segm_map50'] == 1.0
    assert rep['segm_map75'] == 0.0


def test_segm_vs_bbox_independent_ranking():
    """Two detections: high-score bad mask + low-score perfect mask —
    AP reflects the score ordering (fp before tp -> precision 0.5)."""
    gt_mask = encode_rle(_square_mask(10, 10, 30, 30))
    anns = [_ann([[10, 10, 30, 30]], [0], [gt_mask])]
    bad = encode_rle(_square_mask(40, 40, 60, 60))
    dets = [[np.array([[40, 40, 60, 60, 0.95],
                       [10, 10, 30, 30, 0.5]], np.float32)]]
    segms = [[[bad, gt_mask]]]
    rep = coco_fast_segm_eval(dets, segms, anns, classes=['a'])
    np.testing.assert_allclose(rep['segm_map50'], 0.5, atol=1e-6)
