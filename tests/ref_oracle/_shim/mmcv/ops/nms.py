"""Pure-torch greedy NMS oracle matching mmcv.ops.nms semantics.

Deliberately simple (sorted greedy scan) so it is trustworthy as a
golden reference for tpudet's fixed-point XLA NMS.
"""
import torch


def _iou_row(box, boxes):
    # box: (4,), boxes: (N,4) xyxy, no +1 offset (mmcv offset=0)
    x1 = torch.maximum(box[0], boxes[:, 0])
    y1 = torch.maximum(box[1], boxes[:, 1])
    x2 = torch.minimum(box[2], boxes[:, 2])
    y2 = torch.minimum(box[3], boxes[:, 3])
    inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area1 + area2 - inter).clamp(min=1e-12)


def nms(boxes, scores, iou_threshold, offset=0, score_threshold=0,
        max_num=-1):
    assert offset == 0, 'shim supports offset=0 only'
    boxes = boxes.float()
    scores = scores.float()
    if score_threshold > 0:
        valid = scores > score_threshold
        valid_inds = torch.nonzero(valid, as_tuple=False).squeeze(1)
        boxes, scores = boxes[valid], scores[valid]
    else:
        valid_inds = torch.arange(scores.numel())
    order = scores.argsort(descending=True, stable=True)
    suppressed = torch.zeros(order.numel(), dtype=torch.bool)
    keep = []
    for oi in range(order.numel()):
        i = order[oi]
        if suppressed[oi]:
            continue
        keep.append(i.item())
        if max_num > 0 and len(keep) >= max_num:
            break
        rest = order[oi + 1:]
        if rest.numel() == 0:
            break
        alive = ~suppressed[oi + 1:]
        rest_alive = rest[alive]
        if rest_alive.numel():
            ious = _iou_row(boxes[i], boxes[rest_alive])
            kill = ious > iou_threshold
            idx = torch.nonzero(alive, as_tuple=False).squeeze(1)[kill]
            suppressed[oi + 1 + idx] = True
    keep = torch.as_tensor(keep, dtype=torch.long)
    inds = valid_inds[keep]
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=-1)
    return dets, inds


def soft_nms(boxes, scores, iou_threshold=0.3, sigma=0.5, min_score=1e-3,
             method='linear', offset=0):
    assert offset == 0
    boxes = boxes.float().clone()
    scores = scores.float().clone()
    n = scores.numel()
    inds = torch.arange(n)
    keep_boxes, keep_scores, keep_inds = [], [], []
    while scores.numel() > 0:
        top = scores.argmax()
        keep_boxes.append(boxes[top].clone())
        keep_scores.append(scores[top].item())
        keep_inds.append(inds[top].item())
        mask = torch.ones(scores.numel(), dtype=torch.bool)
        mask[top] = False
        box = boxes[top]
        boxes, scores, inds = boxes[mask], scores[mask], inds[mask]
        if scores.numel() == 0:
            break
        ious = _iou_row(box, boxes)
        if method == 'linear':
            decay = torch.where(ious > iou_threshold, 1 - ious,
                                torch.ones_like(ious))
        elif method == 'gaussian':
            decay = torch.exp(-(ious * ious) / sigma)
        else:  # naive
            decay = (ious <= iou_threshold).float()
        scores = scores * decay
        alive = scores > min_score
        boxes, scores, inds = boxes[alive], scores[alive], inds[alive]
    dets = torch.stack(
        [torch.cat([b, torch.tensor([s])])
         for b, s in zip(keep_boxes, keep_scores)]) if keep_boxes else \
        torch.zeros((0, 5))
    return dets, torch.as_tensor(keep_inds, dtype=torch.long)


def nms_match(dets, iou_threshold):
    """Greedy NMS groups: each kept det plus the dets it suppressed."""
    if dets.shape[0] == 0:
        return []
    scores = dets[:, 4]
    boxes = dets[:, :4]
    order = scores.argsort(descending=True, stable=True)
    suppressed = torch.zeros(order.numel(), dtype=torch.bool)
    matched = []
    for oi in range(order.numel()):
        i = order[oi]
        if suppressed[oi]:
            continue
        group = [i.item()]
        rest_pos = torch.arange(oi + 1, order.numel())
        rest_pos = rest_pos[~suppressed[oi + 1:]]
        if rest_pos.numel():
            rest = order[rest_pos]
            ious = _iou_row(boxes[i], boxes[rest])
            kill = ious >= iou_threshold
            group.extend(order[rest_pos[kill]].tolist())
            suppressed[rest_pos[kill]] = True
        matched.append(torch.as_tensor(group, dtype=torch.long))
    return matched


def batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    nms_cfg_ = dict(nms_cfg) if nms_cfg is not None else None
    if nms_cfg_ is None:
        scores, inds = scores.sort(descending=True)
        boxes = boxes[inds]
        return torch.cat([boxes, scores[:, None]], -1), inds
    class_agnostic = nms_cfg_.pop('class_agnostic', class_agnostic)
    nms_type = nms_cfg_.pop('type', 'nms')
    nms_op = {'nms': nms, 'soft_nms': soft_nms}[nms_type]
    nms_cfg_.pop('split_thr', None)
    max_num = nms_cfg_.pop('max_num', -1)
    if not class_agnostic and nms_type == 'nms':
        # Per-class decomposition — EXACTLY equivalent to mmcv's joint NMS
        # over class-offset boxes: the offset puts different classes in
        # disjoint coordinate ranges (cross-class IoU == 0 by construction)
        # and adding a constant to all four coords of the same-class boxes
        # leaves within-class IoU unchanged, so the kept set is identical.
        # The joint greedy's output order (stable score sort, ties by
        # original index) is reconstructed below. Decomposing turns the
        # O(total_kept) python loop over the full candidate tensor into
        # per-class loops over ~N/C-sized tensors — the joint form is
        # ~60s/image on dense YOLO grids (tools/map_parity.py), this is
        # ~1s with identical output.
        #
        # TPUDET_SHIM_NMS_CLASS_MAX (opt-in, e.g. map_parity): cap kept
        # boxes per class at k. Exact for any consumer that takes the top
        # m <= k of the result (multiclass_nms slices [:max_num]): greedy
        # keep decisions depend only on higher-scored kept boxes of the
        # same class, so the per-class top-k kept are unaffected by the
        # cut tail, and the global top-m can only come from per-class
        # top-k. Unset (the default), output is the full exact kept set.
        import os
        class_cap = int(os.environ.get('TPUDET_SHIM_NMS_CLASS_MAX', -1))
        if max_num > 0:
            class_cap = max_num if class_cap <= 0 else min(class_cap,
                                                           max_num)
        kept_idx_parts, kept_score_parts = [], []
        for c in torch.unique(idxs):
            cls_mask = idxs == c
            cls_inds = torch.nonzero(cls_mask, as_tuple=False).squeeze(1)
            # boolean selection preserves original order -> the stable
            # tie-breaking inside `nms` matches the joint run's
            cls_dets, cls_keep = nms_op(boxes[cls_mask], scores[cls_mask],
                                        max_num=class_cap, **nms_cfg_)
            kept_idx_parts.append(cls_inds[cls_keep])
            kept_score_parts.append(cls_dets[:, -1])
        if kept_idx_parts:
            all_idx = torch.cat(kept_idx_parts)
            all_scores = torch.cat(kept_score_parts)
            # joint-greedy emission order: stable sort by score desc with
            # ties broken by original index — order by index first, then
            # stable-argsort by score
            by_idx = all_idx.argsort()
            all_idx, all_scores = all_idx[by_idx], all_scores[by_idx]
            order = all_scores.argsort(descending=True, stable=True)
            keep = all_idx[order]
            kscores = all_scores[order]
        else:
            keep = torch.zeros((0,), dtype=torch.long)
            kscores = torch.zeros((0,))
        if max_num > 0:
            keep, kscores = keep[:max_num], kscores[:max_num]
        return torch.cat([boxes[keep], kscores[:, None]], -1), keep
    if class_agnostic:
        boxes_for_nms = boxes
    else:
        max_coordinate = boxes.max() if boxes.numel() else boxes.new_zeros(())
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1.).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
    dets, keep = nms_op(boxes_for_nms, scores, **nms_cfg_)
    if max_num > 0:
        dets, keep = dets[:max_num], keep[:max_num]
    boxes = boxes[keep]
    scores = dets[:, -1]
    return torch.cat([boxes, scores[:, None]], -1), keep
