"""Dense, shape-static assigners for the generic anchor path.

Rebuild of reference mmdet/core/bbox/assigners/max_iou_assigner.py:212 as a
vectorized computation over padded gts: instead of an AssignResult with
dynamic positive lists, every anchor gets an int code
(-2 ignore / -1 negative / >=0 matched gt index). Semantics preserved:

- anchor is positive to its argmax gt when max IoU >= pos_iou_thr;
- negative when max IoU < neg_iou_thr (scalar threshold case);
- in-between -> ignore;
- low-quality matching: each gt claims its best anchor(s) (ties included,
  IoU >= min_pos_iou), later gts overriding earlier ones exactly like the
  reference's sequential loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bbox import bbox_cxcywh, bbox_overlaps

IGNORE = -2
NEGATIVE = -1


def max_iou_assign(anchors: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   pos_iou_thr: float = 0.5,
                   neg_iou_thr: float = 0.4,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = True,
                   gt_max_assign_all: bool = True) -> jnp.ndarray:
    """Single image. anchors (A, 4), gt (G, 4) padded, gt_valid (G,).

    Returns (A,) int32 assignment codes.
    """
    ious = bbox_overlaps(anchors, gt_bboxes)  # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)

    max_iou = jnp.max(ious, axis=1)
    argmax_gt = jnp.argmax(ious, axis=1).astype(jnp.int32)

    assigned = jnp.full(anchors.shape[0], IGNORE, jnp.int32)
    assigned = jnp.where(max_iou < neg_iou_thr, NEGATIVE, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr, argmax_gt, assigned)

    if match_low_quality:
        # per-gt best anchors, IoU >= min_pos_iou; later gts override
        # (reference max_iou_assigner.py loop order). With
        # gt_max_assign_all=False only the FIRST argmax anchor is taken —
        # IoU ties between anchors of different shapes are real (YOLACT's
        # config relies on this, configs/yolact/yolact_r50_1x8_coco.py).
        gt_max = jnp.max(ious, axis=0)  # (G,)
        if gt_max_assign_all:
            is_tie = ious == gt_max[None, :]
        else:
            first = jnp.argmax(ious, axis=0)  # (G,) first maximal anchor
            is_tie = jnp.arange(anchors.shape[0])[:, None] == first[None, :]
        is_best = is_tie & gt_valid[None, :] & (
            gt_max[None, :] >= min_pos_iou) & (gt_max[None, :] > 0)
        g_idx = jnp.arange(gt_bboxes.shape[0], dtype=jnp.int32)
        # highest gt index claiming this anchor, -1 if none
        claim = jnp.max(jnp.where(is_best, g_idx[None, :], -1), axis=1)
        assigned = jnp.where(claim >= 0, claim, assigned)
    # anchors with no valid gt at all: negative
    assigned = jnp.where(jnp.any(gt_valid), assigned, NEGATIVE)
    return assigned


max_iou_assign_batch = jax.vmap(max_iou_assign,
                                in_axes=(None, 0, 0, None, None, None, None))


def grid_assign(anchors: jnp.ndarray,
                responsible: jnp.ndarray,
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                pos_iou_thr: float = 0.5,
                neg_iou_thr: float = 0.5,
                min_pos_iou: float = 0.0) -> jnp.ndarray:
    """YOLOv3 GridAssigner as a dense computation
    (reference mmdet/core/bbox/assigners/grid_assigner.py:10-150):

    1. default ignore;
    2. anchors with max IoU <= neg_iou_thr -> negative;
    3. responsible anchors with (responsible-masked) max IoU > pos_iou_thr
       -> that argmax gt;
    4. each gt claims its best responsible anchor(s) (ties,
       IoU > min_pos_iou), later gts override.
    """
    ious = bbox_overlaps(anchors, gt_bboxes)  # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)

    max_all = jnp.max(ious, axis=1)
    assigned = jnp.full(anchors.shape[0], IGNORE, jnp.int32)
    assigned = jnp.where((max_all >= 0) & (max_all <= neg_iou_thr), NEGATIVE,
                         assigned)

    resp_ious = jnp.where(responsible[:, None], ious, -1.0)
    max_resp = jnp.max(resp_ious, axis=1)
    argmax_resp = jnp.argmax(resp_ious, axis=1).astype(jnp.int32)
    pos = (max_resp > pos_iou_thr) & responsible
    assigned = jnp.where(pos, argmax_resp, assigned)

    # step 4: per-gt best responsible anchor(s)
    gt_max = jnp.max(resp_ious, axis=0)  # (G,)
    is_best = (resp_ious == gt_max[None, :]) & gt_valid[None, :] & (
        gt_max[None, :] > min_pos_iou)
    g_idx = jnp.arange(gt_bboxes.shape[0], dtype=jnp.int32)
    claim = jnp.max(jnp.where(is_best, g_idx[None, :], -1), axis=1)
    assigned = jnp.where(claim >= 0, claim, assigned)
    assigned = jnp.where(jnp.any(gt_valid), assigned, NEGATIVE)
    return assigned


grid_assign_batch = jax.vmap(
    grid_assign, in_axes=(None, 0, 0, 0, None, None, None))


def atss_assign(anchors: jnp.ndarray,
                num_level_anchors,
                gt_bboxes: jnp.ndarray,
                gt_valid: jnp.ndarray,
                topk: int = 9) -> jnp.ndarray:
    """ATSS assigner as a dense computation
    (reference mmdet/core/bbox/assigners/atss_assigner.py): per gt, take
    the top-k closest anchors per level (center distance), compute an
    adaptive IoU threshold = mean + std of those candidates' IoUs, and
    assign candidates above it whose center lies inside the gt. Each anchor
    goes to the gt with the highest IoU among its claims.

    Args:
        anchors: (A, 4); num_level_anchors: static list of per-level counts;
        gt_bboxes: (G, 4) padded; gt_valid: (G,).

    Returns (A,) int32: -1 negative, >=0 gt index.
    """
    ious = bbox_overlaps(anchors, gt_bboxes)  # (A, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    a_cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    a_cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    g_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    g_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    dist = jnp.sqrt((a_cx[:, None] - g_cx[None, :])**2 +
                    (a_cy[:, None] - g_cy[None, :])**2)  # (A, G)

    # per-level top-k candidate mask (static level slices)
    candidate = jnp.zeros(dist.shape, bool)
    start = 0
    for n in num_level_anchors:
        lvl_dist = dist[start:start + n]  # (n, G)
        k = min(topk, n)
        _, idx = jax.lax.top_k(-lvl_dist.T, k)  # (G, k)
        lvl_mask = jnp.zeros((gt_bboxes.shape[0], n), bool)
        lvl_mask = lvl_mask.at[
            jnp.arange(gt_bboxes.shape[0])[:, None], idx].set(True)
        candidate = candidate.at[start:start + n].set(lvl_mask.T)
        start += n

    cand_ious = jnp.where(candidate, ious, jnp.nan)
    mean = jnp.nanmean(cand_ious, axis=0)  # (G,)
    std = jnp.sqrt(jnp.nanmean((cand_ious - mean[None, :])**2, axis=0))
    thr = mean + std  # (G,)

    # center-inside-gt constraint
    inside = ((a_cx[:, None] > gt_bboxes[None, :, 0]) &
              (a_cx[:, None] < gt_bboxes[None, :, 2]) &
              (a_cy[:, None] > gt_bboxes[None, :, 1]) &
              (a_cy[:, None] < gt_bboxes[None, :, 3]))
    pos = candidate & (ious >= thr[None, :]) & inside & gt_valid[None, :]

    pos_ious = jnp.where(pos, ious, -1.0)
    best_gt = jnp.argmax(pos_ious, axis=1).astype(jnp.int32)
    has_pos = jnp.any(pos, axis=1)
    return jnp.where(has_pos, best_gt, NEGATIVE)


def atss_assign_batch(anchors, num_level_anchors, gt_bboxes, gt_valid,
                      topk: int = 9):
    return jax.vmap(
        lambda g, v: atss_assign(anchors, num_level_anchors, g, v, topk)
    )(gt_bboxes, gt_valid)


def uniform_assign(pred_boxes: jnp.ndarray,
                   anchors: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   match_times: int = 4,
                   pos_ignore_thr: float = 0.15,
                   neg_ignore_thr: float = 0.7) -> jnp.ndarray:
    """YOLOF's uniform matching (reference uniform_assigner.py:34-128),
    shape-static over padded gts.

    Per gt, the ``match_times`` lowest-L1-cost predicted boxes AND the
    ``match_times`` lowest-cost anchors become candidate positives; a
    candidate whose *anchor* IoU with its gt is below ``pos_ignore_thr`` is
    ignored. Non-candidates whose *predicted* max-IoU exceeds
    ``neg_ignore_thr`` are ignored. The reference writes candidates with a
    flat scatter so later entries win ties; reproduced here by a
    scatter-max of the flat entry order.
    """
    num_a = anchors.shape[0]
    num_g = gt_bboxes.shape[0]
    k = min(match_times, num_a)

    gt_c = bbox_cxcywh(gt_bboxes)
    cost_pred = jnp.sum(
        jnp.abs(bbox_cxcywh(pred_boxes)[:, None] - gt_c[None]), -1)  # (A, G)
    cost_anchor = jnp.sum(
        jnp.abs(bbox_cxcywh(anchors)[:, None] - gt_c[None]), -1)

    # per-gt k smallest costs -> (G, k) anchor indices
    _, idx_pred = jax.lax.top_k(-cost_pred.T, k)
    _, idx_anchor = jax.lax.top_k(-cost_anchor.T, k)

    # reference flat order: cat((index, index1), dim=1).reshape(-1) where
    # index is (k, G) -> order is [k0: pred g0..G-1, anchor g0..G-1, k1: ...]
    flat_idx = jnp.stack([idx_pred.T, idx_anchor.T], 1).reshape(-1)  # (k*2G,)
    flat_gt = jnp.tile(jnp.arange(num_g, dtype=jnp.int32), 2 * k)
    order = jnp.arange(flat_idx.shape[0], dtype=jnp.int32) + 1
    order = jnp.where(flat_gt >= 0, order, 0)
    order = jnp.where(jnp.take(gt_valid, flat_gt), order, 0)

    winner = jnp.zeros((num_a,), jnp.int32).at[flat_idx].max(order)
    win_gt = (winner - 1) % num_g  # flat order -> gt id (valid when winner>0)

    anchor_ious = bbox_overlaps(anchors, gt_bboxes)  # (A, G)
    anchor_ious = jnp.where(gt_valid[None, :], anchor_ious, -1.0)
    win_iou = jnp.take_along_axis(anchor_ious, win_gt[:, None], 1)[:, 0]

    pred_ious = bbox_overlaps(pred_boxes, gt_bboxes)
    pred_max = jnp.max(jnp.where(gt_valid[None, :], pred_ious, -1.0), axis=1)

    assigned = jnp.where(pred_max > neg_ignore_thr, IGNORE, NEGATIVE)
    assigned = jnp.where(winner > 0,
                         jnp.where(win_iou < pos_ignore_thr, IGNORE, win_gt),
                         assigned)
    return jnp.where(jnp.any(gt_valid), assigned,
                     jnp.full((num_a,), NEGATIVE, jnp.int32))


uniform_assign_batch = jax.vmap(uniform_assign,
                                in_axes=(0, None, 0, 0, None, None, None))


def uniform_match_pairs(pred_boxes: jnp.ndarray,
                        anchors: jnp.ndarray,
                        gt_bboxes: jnp.ndarray,
                        gt_valid: jnp.ndarray,
                        match_times: int = 4,
                        pos_ignore_thr: float = 0.15):
    """The (anchor, gt) candidate-pair list of YOLOF's uniform matching.

    The reference regresses over ALL ``match_times*2*num_gt`` candidate
    pairs — `bbox_pred[indexes]` vs `gt_bboxes[pos_gt_index]` with weight
    ``~pos_ignore_idx`` (uniform_assigner.py:105-137, yolof_head.py loss) —
    duplicates included, and pairs keep their own gt even when the
    per-anchor scatter later reassigns the anchor's class target.

    Returns ``(pair_anchor, pair_gt, pair_pos)`` each of shape
    ``(match_times * 2 * num_gt,)``; ``pair_pos`` is True where the pair's
    ANCHOR IoU with its gt reaches ``pos_ignore_thr`` and the gt is valid.
    """
    num_a = anchors.shape[0]
    num_g = gt_bboxes.shape[0]
    k = min(match_times, num_a)

    gt_c = bbox_cxcywh(gt_bboxes)
    cost_pred = jnp.sum(
        jnp.abs(bbox_cxcywh(pred_boxes)[:, None] - gt_c[None]), -1)
    cost_anchor = jnp.sum(
        jnp.abs(bbox_cxcywh(anchors)[:, None] - gt_c[None]), -1)
    _, idx_pred = jax.lax.top_k(-cost_pred.T, k)
    _, idx_anchor = jax.lax.top_k(-cost_anchor.T, k)
    pair_anchor = jnp.stack([idx_pred.T, idx_anchor.T], 1).reshape(-1)
    pair_gt = jnp.tile(jnp.arange(num_g, dtype=jnp.int32), 2 * k)

    anchor_ious = bbox_overlaps(anchors, gt_bboxes)  # (A, G)
    pair_iou = anchor_ious[pair_anchor, pair_gt]
    pair_pos = (pair_iou >= pos_ignore_thr) & jnp.take(gt_valid, pair_gt)
    return pair_anchor, pair_gt, pair_pos


uniform_match_pairs_batch = jax.vmap(
    uniform_match_pairs, in_axes=(0, None, 0, 0, None, None))


def hungarian_assign(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Optimal bipartite matching (reference hungarian_assigner.py): rows are
    queries/predictions, cols are padded gts. Invalid gts are excluded.

    Returns (Q,) int32: matched gt index or NEGATIVE. Runs
    scipy.optimize.linear_sum_assignment on host via ``pure_callback``
    (assignment indices carry no gradient), shape-static under jit/vmap.
    """
    q, g = cost.shape

    def host_lsa(c, v):
        import numpy as _np
        from scipy.optimize import linear_sum_assignment
        c = _np.asarray(c, _np.float64).copy()
        v = _np.asarray(v)
        # infeasible columns get a huge cost; we drop those matches after
        BIG = 1e9
        c[:, ~v] = BIG
        rows, cols = linear_sum_assignment(c)
        out = _np.full((q,), NEGATIVE, _np.int32)
        for r, cl in zip(rows, cols):
            if v[cl]:
                out[r] = cl
        return out

    # indices carry no gradient; stop_gradient keeps JVP tracing out of the
    # callback (pure_callback has no JVP rule)
    return jax.pure_callback(
        host_lsa, jax.ShapeDtypeStruct((q,), jnp.int32),
        jax.lax.stop_gradient(cost), gt_valid, vmap_method='sequential')
