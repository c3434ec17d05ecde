#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Exact-vs-capped NMS candidate-budget ablation.

The reference's flagship config runs NMS UNCAPPED (nms_pre=-1,
configs/yolov4/yolov4l_coco_mosaic.py:14-15) over all ~25k anchors x 80
classes.  tpudet's TPU path prunes twice for speed:
  anchor_pre: top-k anchors by objectness before the class flatten;
  nms_pre:    top-k (box, class) pairs by score before suppression.
This harness measures what those budgets cost on realistic trained-score
distributions plus adversarial near-threshold synthetics, by comparing
detection sets against the exact uncapped path.

Output: JSON report (committed as docs/nms_budget_ablation.json).
"""
import argparse
import json

import numpy as np


def synth_candidates(num_anchors, num_classes, num_objects=40, seed=0,
                     img=640.0, adversarial=False):
    """Trained-detector-like candidate set: a few hundred boxes cluster
    on each object with high conf/cls there; everything else is
    near-background noise with a heavy low-score tail."""
    rng = np.random.RandomState(seed)
    boxes = np.zeros((num_anchors, 4), np.float32)
    conf = rng.beta(0.3, 60.0, num_anchors).astype(np.float32)  # bg tail
    cls = rng.beta(0.3, 80.0, (num_anchors, num_classes)).astype(np.float32)

    per_obj = max(num_anchors // (num_objects * 8), 8)
    centers = rng.uniform(40, img - 40, (num_objects, 2))
    sizes = rng.uniform(16, 180, (num_objects, 2))
    classes = rng.randint(0, num_classes, num_objects)
    idx = rng.permutation(num_anchors)
    p = 0
    for o in range(num_objects):
        take = idx[p:p + per_obj]
        p += per_obj
        jit_c = centers[o] + rng.normal(0, sizes[o] * 0.15, (len(take), 2))
        jit_s = sizes[o] * np.exp(rng.normal(0, 0.15, (len(take), 2)))
        boxes[take, 0:2] = jit_c - jit_s / 2
        boxes[take, 2:4] = jit_c + jit_s / 2
        # conf peaked on the object, decaying with rank
        q = rng.beta(6, 2, len(take)).astype(np.float32)
        conf[take] = np.maximum(conf[take], q * rng.uniform(0.3, 0.99))
        cls[take, classes[o]] = np.maximum(
            cls[take, classes[o]], rng.beta(8, 2, len(take)))
        # secondary (confusable) class
        alt = (classes[o] + 1) % num_classes
        cls[take, alt] = np.maximum(cls[take, alt],
                                    rng.beta(2, 8, len(take)))
    # background boxes everywhere
    rest = idx[p:]
    xy = rng.uniform(0, img - 30, (len(rest), 2))
    wh = rng.uniform(8, 120, (len(rest), 2))
    boxes[rest, 0:2] = xy
    boxes[rest, 2:4] = np.minimum(xy + wh, img)
    if adversarial:
        # pile score mass just above score_thr: ties + near-threshold
        k = num_anchors // 4
        sel = rng.choice(num_anchors, k, replace=False)
        conf[sel] = 0.033
        cls[sel, rng.randint(0, num_classes, k)] = 0.0315  # score ~1.04e-3
    boxes = np.clip(boxes, 0, img)
    return boxes, conf, cls


def run_ablation(num_anchors=25200, num_classes=80, score_thr=0.001,
                 iou_thr=0.65, max_per_img=300,
                 budgets=((1024, 8192, 0, 0),
                          (2048, 8192, 0, 0),
                          (4096, 16384, 0, 0),
                          (2048, 0, 256, 0),
                          (2048, 0, 300, 0),
                          (0, 0, 256, 0),
                          # lane-local budgets (core/nms.py::
                          # lane_topk_select): k per 128-lane column
                          (2048, 0, 0, 2),
                          (2048, 0, 0, 4),
                          # composite: lane preselect -> exact per-class
                          # slice (shipped default, yolov4s/l)
                          (2048, 0, 256, 4)),
                 seeds=(0, 1, 2), adversarial=(False, True)):
    import jax.numpy as jnp

    from tpudet.core.nms import batched_class_sorted_nms, batched_nms

    def exact_numpy(boxes, conf, cls):
        """Exact uncapped reference: host greedy class-offset NMS over
        ALL score-thresholded (box, class) pairs (what mmcv batched_nms
        computes after multiclass_nms's dynamic filtering — dynamic
        shapes make this host/GPU-only; the padded TPU path needs the
        budgets this harness validates)."""
        scores = cls * conf[:, None]  # (A, C)
        a_idx, c_idx = np.nonzero(scores > score_thr)
        s = scores[a_idx, c_idx]
        b = boxes[a_idx]
        # class-offset trick
        off = c_idx.astype(np.float32) * (boxes.max() + 1.0)
        bo = b + off[:, None]
        order = np.argsort(-s, kind='stable')
        bo, b, s, c_idx = bo[order], b[order], s[order], c_idx[order]
        keep = []
        sup = np.zeros(len(s), bool)
        areas = (bo[:, 2] - bo[:, 0]) * (bo[:, 3] - bo[:, 1])
        for i in range(len(s)):
            if sup[i]:
                continue
            keep.append(i)
            if len(keep) >= max_per_img:
                break
            x1 = np.maximum(bo[i, 0], bo[i + 1:, 0])
            y1 = np.maximum(bo[i, 1], bo[i + 1:, 1])
            x2 = np.minimum(bo[i, 2], bo[i + 1:, 2])
            y2 = np.minimum(bo[i, 3], bo[i + 1:, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            iou = inter / np.maximum(
                areas[i] + areas[i + 1:] - inter, 1e-9)
            sup[i + 1:] |= iou > iou_thr
        keep = np.asarray(keep, int)
        return np.concatenate(
            [b[keep], s[keep, None], c_idx[keep, None].astype(np.float32)],
            -1)

    def detections(boxes, conf, cls, anchor_pre, nms_pre, class_pre=0,
                   lane_pre=0):
        if not anchor_pre and not nms_pre and not class_pre and \
                not lane_pre:
            return exact_numpy(boxes, conf, cls)
        b = jnp.asarray(boxes)[None]
        cf = jnp.asarray(conf)[None]
        cl = jnp.asarray(cls)[None]
        if anchor_pre and 0 < anchor_pre < cf.shape[1]:
            from tpudet.core.nms import topk_scores
            top_conf, top_idx = topk_scores(cf, anchor_pre)
            b = jnp.take_along_axis(b, top_idx[..., None], axis=1)
            cf = top_conf
            cl = jnp.take_along_axis(cl, top_idx[..., None], axis=1)
        scores = cl * cf[..., None]
        if lane_pre:
            # lane-local per-class budget (core/nms.py::class_lane_nms);
            # with class_pre also set, the composite budget
            from tpudet.core.nms import batched_class_lane_nms
            res = batched_class_lane_nms(b, scores, score_thr, iou_thr,
                                         max_per_img, lane_pre=lane_pre,
                                         class_pre=class_pre)
        elif class_pre:
            # per-class candidate budget (core/nms.py::class_sorted_nms)
            res = batched_class_sorted_nms(b, scores, score_thr, iou_thr,
                                           max_per_img, class_pre=class_pre)
        else:
            total = scores.shape[1] * scores.shape[2]
            k = total if not nms_pre or nms_pre <= 0 else min(nms_pre, total)
            res = batched_nms(b, scores, score_thr, iou_thr, max_per_img,
                              nms_pre=k)
        valid = np.asarray(res.valid)[0]
        out = np.concatenate(
            [np.asarray(res.bboxes)[0], np.asarray(res.scores)[0][:, None],
             np.asarray(res.labels)[0][:, None].astype(np.float32)], -1)
        return out[valid]

    def match_sets(exact, capped):
        """Detection-set delta: per exact det, is there a capped det with
        same label, IoU>0.99 and |score diff|<1e-4?"""
        missing = []
        for d in exact:
            same = capped[capped[:, 5] == d[5]]
            ok = False
            for c in same:
                if abs(c[4] - d[4]) > 1e-4:
                    continue
                x1 = max(c[0], d[0]); y1 = max(c[1], d[1])
                x2 = min(c[2], d[2]); y2 = min(c[3], d[3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                a1 = (c[2] - c[0]) * (c[3] - c[1])
                a2 = (d[2] - d[0]) * (d[3] - d[1])
                if inter / max(a1 + a2 - inter, 1e-9) > 0.99:
                    ok = True
                    break
            if not ok:
                missing.append(float(d[4]))
        return missing

    report = {'num_anchors': num_anchors, 'num_classes': num_classes,
              'score_thr': score_thr, 'iou_thr': iou_thr,
              'max_per_img': max_per_img, 'cases': []}
    for adv in adversarial:
        for seed in seeds:
            boxes, conf, cls = synth_candidates(
                num_anchors, num_classes, seed=seed, adversarial=adv)
            exact = detections(boxes, conf, cls, 0, 0)
            case = {'adversarial': adv, 'seed': seed,
                    'exact_num_dets': int(len(exact)),
                    'exact_min_score': float(exact[:, 4].min())
                    if len(exact) else None,
                    'budgets': {}}
            for budget in budgets:
                a_pre, n_pre, c_pre = budget[:3]
                l_pre = budget[3] if len(budget) > 3 else 0
                capped = detections(boxes, conf, cls, a_pre, n_pre, c_pre,
                                    l_pre)
                missing = match_sets(exact, capped)
                if l_pre and c_pre:
                    tag = f'anchor{a_pre}_lane{l_pre}_class{c_pre}'
                elif l_pre:
                    tag = f'anchor{a_pre}_lane{l_pre}'
                elif c_pre:
                    tag = f'anchor{a_pre}_class{c_pre}'
                else:
                    tag = f'anchor{a_pre}_nms{n_pre}'
                case['budgets'][tag] = {
                    'num_dets': int(len(capped)),
                    'missing_dets': len(missing),
                    'max_missing_score': max(missing) if missing else 0.0,
                }
            report['cases'].append(case)
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--anchors', type=int, default=25200)
    p.add_argument('--classes', type=int, default=80)
    p.add_argument('--out', default='docs/nms_budget_ablation.json')
    args = p.parse_args()
    report = run_ablation(args.anchors, args.classes)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)


if __name__ == '__main__':
    main()
