"""Soft-NMS parity vs the oracle shim + the LIVE reference multiclass path.

The reference reaches soft-NMS via ``nms_cfg=dict(type='soft_nms')``
dispatched inside mmcv ``batched_nms``
(/root/reference/mmdet/core/post_processing/bbox_nms.py:84); the oracle
shim re-implements mmcv's soft_nms in pure torch
(_shim/mmcv/ops/nms.py::soft_nms). tpudet's ``soft_nms_padded``
(tpudet/core/nms.py) is a fixed-trip scan; its above-``min_score`` pick
sequence and decayed scores must match the shim's dynamic loop for both
decay methods, and the full tpudet ``multiclass_nms(nms_type='soft_nms')``
must match the LIVE reference ``multiclass_nms`` end to end.
"""
import numpy as np
import pytest

from . import refbridge

jnp = pytest.importorskip('jax.numpy')

RNG = np.random.RandomState(20260819)


def _clustered_boxes(n, n_clusters=6, size=200.0, rng=RNG):
    """Boxes in overlapping clusters so soft decay actually fires."""
    centers = rng.uniform(30, size - 30, (n_clusters, 2))
    out = []
    for i in range(n):
        c = centers[i % n_clusters] + rng.randn(2) * 6
        wh = rng.uniform(18, 42, 2)
        out.append([c[0] - wh[0] / 2, c[1] - wh[1] / 2,
                    c[0] + wh[0] / 2, c[1] + wh[1] / 2])
    return np.asarray(out, np.float32)


@pytest.mark.parametrize('method,iou_thr,sigma',
                         [('linear', 0.3, 0.5),
                          ('gaussian', 0.3, 0.5),
                          ('gaussian', 0.5, 0.35)])
def test_soft_nms_padded_matches_shim(method, iou_thr, sigma):
    import torch
    shim_nms = refbridge.ref_import('mmcv.ops')  # the shim module
    from tpudet.core.nms import soft_nms_padded

    boxes = _clustered_boxes(60)
    scores = RNG.uniform(0.05, 1.0, 60).astype(np.float32)

    ref_dets, ref_inds = shim_nms.soft_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores),
        iou_threshold=iou_thr, sigma=sigma, min_score=1e-3, method=method)

    keep_idx, keep_scores, keep_valid = soft_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), iou_thr, max_out=60,
        sigma=sigma, min_score=1e-3, method=method)
    keep_idx = np.asarray(keep_idx)[np.asarray(keep_valid)]
    keep_scores = np.asarray(keep_scores)[np.asarray(keep_valid)]

    # identical pick sequence, decayed scores to float32 tolerance
    np.testing.assert_array_equal(keep_idx, ref_inds.numpy())
    np.testing.assert_allclose(keep_scores, ref_dets[:, 4].numpy(),
                               atol=1e-5, rtol=1e-5)
    # every kept (decayed) score is above min_score, like the shim's
    assert (keep_scores > 1e-3).all()


@pytest.mark.parametrize('method', ['linear', 'gaussian'])
def test_multiclass_soft_nms_matches_live_reference(method):
    """tpudet multiclass_nms(nms_type='soft_nms') vs the LIVE reference
    multiclass_nms with nms_cfg=dict(type='soft_nms') — the exact path a
    config like retinanet_r50_fpn_softnms_1x_coco.py exercises."""
    import torch
    post = refbridge.ref_import('mmdet.core.post_processing')
    from tpudet.core.nms import multiclass_nms

    n, c = 80, 5
    boxes = _clustered_boxes(n)
    scores = RNG.uniform(0.0, 1.0, (n, c)).astype(np.float32) ** 2

    score_thr = 0.05
    ref_dets, ref_labels = post.multiclass_nms(
        torch.from_numpy(boxes),
        # reference wants a trailing background column
        torch.from_numpy(np.concatenate(
            [scores, np.zeros((n, 1), np.float32)], axis=1)),
        score_thr,
        dict(type='soft_nms', iou_threshold=0.3, sigma=0.5,
             min_score=1e-3, method=method),
        max_num=100)

    res = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         score_thr=score_thr, iou_thr=0.3, max_per_img=100,
                         nms_pre=n * c, nms_type='soft_nms', sigma=0.5,
                         min_score=1e-3, method=method)
    valid = np.asarray(res.valid)
    my_boxes = np.asarray(res.bboxes)[valid]
    my_scores = np.asarray(res.scores)[valid]
    my_labels = np.asarray(res.labels)[valid]

    assert my_boxes.shape[0] == ref_dets.shape[0]
    np.testing.assert_allclose(my_boxes, ref_dets[:, :4].numpy(),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(my_scores, ref_dets[:, 4].numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(my_labels, ref_labels.numpy())
