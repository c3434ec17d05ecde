"""Prefiltered decode must equal dense decode + top-k selection.

`YOLOCSPHead._prefiltered_decode` moves the objectness top-k into logit
space so only the selected anchors are sigmoided/decoded (reference decode
semantics: mmdet/models/dense_heads/yolocsp_head.py:263-294 computes the
full grid). Sigmoid is monotonic, so on exact top-k sizes the selected
set, scores, and decoded boxes must match the dense path bit-for-bit in
fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.core.nms import topk_scores
from tpudet.models.dense_heads.yolocsp_head import YOLOCSPHead


def _make_head_and_maps(img=64, batch=2, num_classes=7, seed=0):
    head = YOLOCSPHead(num_classes=num_classes,
                       in_channels=[32, 32, 32])
    rng = np.random.RandomState(seed)
    maps = []
    for stride in head.featmap_strides:
        hw = img // stride
        maps.append(jnp.asarray(rng.randn(
            batch, hw, hw, 3 * (5 + num_classes)).astype(np.float32) * 2))
    return head, maps


@pytest.mark.parametrize('anchor_pre', [16, 64])
def test_prefiltered_decode_matches_dense(anchor_pre):
    head, maps = _make_head_and_maps()

    bbox_p, conf_p, cls_p = head._prefiltered_decode(maps, anchor_pre)

    bbox_d, conf_d, cls_d = head.decode_pred_maps(maps)
    top_conf, top_idx = topk_scores(conf_d, anchor_pre)
    bbox_sel = jnp.take_along_axis(bbox_d, top_idx[..., None], axis=1)
    cls_sel = jnp.take_along_axis(cls_d, top_idx[..., None], axis=1)

    np.testing.assert_array_equal(np.asarray(conf_p), np.asarray(top_conf))
    np.testing.assert_array_equal(np.asarray(bbox_p), np.asarray(bbox_sel))
    np.testing.assert_array_equal(np.asarray(cls_p), np.asarray(cls_sel))


def test_get_bboxes_same_dets_either_path():
    """End to end: get_bboxes with a prefilter budget covering every
    above-threshold candidate returns the same detections as the dense
    path (anchor_pre=0)."""
    head, maps = _make_head_and_maps()
    kw = dict(score_thr=0.05, iou_thr=0.65, max_per_img=20,
              class_pre=16, nms_pre=-1)
    r_pre = head.get_bboxes(maps, anchor_pre=48, **kw)
    r_dense = head.get_bboxes(maps, anchor_pre=0, **kw)
    n_pre = int(np.asarray(r_pre.valid).sum())
    n_dense = int(np.asarray(r_dense.valid).sum())
    assert n_pre == n_dense and n_pre > 0
    m = np.asarray(r_dense.valid)
    np.testing.assert_allclose(np.asarray(r_pre.bboxes)[m],
                               np.asarray(r_dense.bboxes)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_pre.scores)[m],
                               np.asarray(r_dense.scores)[m], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_pre.labels)[m],
                                  np.asarray(r_dense.labels)[m])


def test_prefilter_engages_only_below_grid_size():
    """anchor_pre >= total anchors must fall back to the dense decode
    (the 64px grid has (8^2+4^2+2^2)*3 = 252 anchors)."""
    head, maps = _make_head_and_maps()
    r_big = head.get_bboxes(maps, anchor_pre=252, score_thr=0.05,
                            iou_thr=0.65, max_per_img=20, class_pre=16)
    r_off = head.get_bboxes(maps, anchor_pre=0, score_thr=0.05,
                            iou_thr=0.65, max_per_img=20, class_pre=16)
    np.testing.assert_array_equal(np.asarray(r_big.valid),
                                  np.asarray(r_off.valid))
    m = np.asarray(r_off.valid)
    np.testing.assert_allclose(np.asarray(r_big.bboxes)[m],
                               np.asarray(r_off.bboxes)[m], atol=1e-6)
