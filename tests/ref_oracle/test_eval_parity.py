"""Golden parity of the evaluators against the LIVE reference python
implementations (pure numpy in the reference — no Cython needed):

- eval_map (VOC protocol incl. 11-point mode, ignore regions, scale
  ranges) vs tpudet.evaluation.voc_map.eval_map
- eval_recalls (proposal AR machinery) vs tpudet.evaluation.recall

This addresses the round-1 finding that the evaluator had no external
golden anchor.
"""
import numpy as np
import pytest

from . import refbridge

RNG = np.random.RandomState(99)


def _rand_dets(n, num_classes, size=256.0):
    """per-class (k, 5) arrays for one image."""
    out = []
    for _ in range(num_classes):
        k = RNG.randint(0, n + 1)
        xy = RNG.uniform(0, size * 0.7, (k, 2))
        wh = RNG.uniform(4, size * 0.3, (k, 2))
        score = RNG.uniform(0.05, 1.0, (k, 1))
        out.append(np.concatenate([xy, xy + wh, score],
                                  axis=-1).astype(np.float32))
    return out


def _rand_ann(num_classes, size=256.0, with_ignore=True):
    n = RNG.randint(1, 8)
    xy = RNG.uniform(0, size * 0.7, (n, 2))
    wh = RNG.uniform(4, size * 0.3, (n, 2))
    ann = dict(
        bboxes=np.concatenate([xy, xy + wh], axis=-1).astype(np.float32),
        labels=RNG.randint(0, num_classes, n).astype(np.int64))
    if with_ignore:
        m = RNG.randint(0, 3)
        xy = RNG.uniform(0, size * 0.7, (m, 2))
        wh = RNG.uniform(4, size * 0.3, (m, 2))
        ann['bboxes_ignore'] = np.concatenate(
            [xy, xy + wh], axis=-1).astype(np.float32)
        ann['labels_ignore'] = RNG.randint(0, num_classes, m).astype(
            np.int64)
    return ann


@pytest.mark.parametrize('dataset,scale_ranges', [
    (None, None),
    ('voc07', None),
    (None, [(0, 32), (32, 1e5)]),
])
def test_eval_map_parity(dataset, scale_ranges):
    ref_eval = refbridge.ref_import('mmdet.core.evaluation')
    from tpudet.evaluation.voc_map import eval_map

    num_classes = 4
    dets = [_rand_dets(6, num_classes) for _ in range(8)]
    anns = [_rand_ann(num_classes) for _ in range(8)]
    # overlap some detections with gts so tp exist
    for d, a in zip(dets, anns):
        for j, (box, lab) in enumerate(zip(a['bboxes'], a['labels'])):
            jitter = RNG.uniform(-3, 3, 4).astype(np.float32)
            det = np.concatenate([box + jitter,
                                  [RNG.uniform(0.5, 1.0)]]).astype(
                np.float32)
            d[lab] = np.vstack([d[lab], det])

    ref_map, ref_cls = ref_eval.eval_map(
        [list(d) for d in dets], [dict(a) for a in anns],
        scale_ranges=scale_ranges, iou_thr=0.5, dataset=dataset, nproc=1,
        logger='silent')
    my_map, my_cls = eval_map(dets, anns, scale_ranges=scale_ranges,
                              iou_thr=0.5, dataset=dataset)
    np.testing.assert_allclose(np.asarray(my_map), np.asarray(ref_map),
                               atol=1e-6)
    for mc, rc in zip(my_cls, ref_cls):
        np.testing.assert_allclose(mc['ap'], rc['ap'], atol=1e-6)
        assert mc['num_dets'] == rc['num_dets']
        np.testing.assert_array_equal(np.asarray(mc['num_gts']),
                                      np.asarray(rc['num_gts']))


def test_eval_recalls_parity():
    ref_eval = refbridge.ref_import('mmdet.core.evaluation')
    from tpudet.evaluation.recall import eval_recalls

    gts, props = [], []
    for _ in range(6):
        n = RNG.randint(0, 6)
        xy = RNG.uniform(0, 180, (n, 2))
        wh = RNG.uniform(4, 70, (n, 2))
        gts.append(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        k = RNG.randint(5, 40)
        xy = RNG.uniform(0, 180, (k, 2))
        wh = RNG.uniform(4, 70, (k, 2))
        score = RNG.uniform(0, 1, (k, 1))
        props.append(np.concatenate([xy, xy + wh, score],
                                    -1).astype(np.float32))
        # seed overlapping proposals
        if n:
            close = np.concatenate(
                [gts[-1] + RNG.uniform(-2, 2, (n, 4)).astype(np.float32),
                 RNG.uniform(0, 1, (n, 1)).astype(np.float32)], -1)
            props[-1] = np.vstack([props[-1], close])

    nums = (4, 10, 100)
    thrs = [0.5, 0.75]
    # The reference's eval_recalls wrapper crashes on modern numpy
    # (np.array over ragged per-image IoU lists); drive its _recalls
    # matcher + bbox_overlaps directly with an object array instead —
    # all matching logic stays reference-owned.
    recall_mod = refbridge.ref_import('mmdet.core.evaluation.recall')
    all_ious = []
    for g, p in zip(gts, props):
        sort_idx = np.argsort(p[:, 4])[::-1]
        p_sorted = p[sort_idx, :]
        prop_num = min(p_sorted.shape[0], nums[-1])
        if g.shape[0] == 0:
            ious = np.zeros((0, p_sorted.shape[0]), np.float32)
        else:
            ious = recall_mod.bbox_overlaps(g, p_sorted[:prop_num, :4])
        all_ious.append(ious)
    obj = np.empty(len(all_ious), object)
    obj[:] = all_ious
    ref = recall_mod._recalls(obj, np.array(nums), np.array(thrs))
    mine = eval_recalls(gts, props, list(nums), thrs)
    np.testing.assert_allclose(mine, np.asarray(ref), atol=1e-6)
