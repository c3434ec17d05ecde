"""Batched COCO-val testing (reference mmdet/apis/test.py analogue).

``single_device_test`` runs the whole val set through one compiled
batch program (static 640-padded batches) and returns results in the
reference format (per image, per class (n, 5) arrays). There is no
multi_gpu_test/collect_results machinery: under a sharded mesh the same
compiled program consumes sharded batches, and hosts gather numpy results
locally (per-host disjoint index shards).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

from .inference import nms_result_to_per_class


def tta_get_bboxes(model, variables, aug_imgs, aug_scale_factors,
                   aug_flips, score_thr=0.001, iou_thr=0.65,
                   max_per_img=300, nms_pre=4096):
    """Test-time augmentation: decode every aug without NMS, map boxes back
    to original image space (inverse scale + unflip), concatenate candidate
    sets, then one NMS (reference: dense_test_mixins.aug_test_bboxes +
    core/post_processing/merge_augs.py semantics).

    Args:
        aug_imgs: list of (B, H, W, 3) arrays, one per augmentation.
        aug_scale_factors: list of (B, 4) letterbox scale factors.
        aug_flips: list of bool (horizontal flip applied?).
    """
    import jax.numpy as jnp

    from ..core.nms import batched_nms

    all_boxes, all_scores = [], []
    for img, sf, flip in zip(aug_imgs, aug_scale_factors, aug_flips):
        pred_maps = model.apply(variables, img)
        bbox, scores = model.bbox_head.get_bboxes(pred_maps, with_nms=False)
        if flip:
            w = img.shape[2] / sf[:, None, 0]  # original-space width
            x1 = w - bbox[..., 2] / sf[:, None, 0]
            x2 = w - bbox[..., 0] / sf[:, None, 0]
            bbox = jnp.stack([x1, bbox[..., 1] / sf[:, None, 1], x2,
                              bbox[..., 3] / sf[:, None, 3]], axis=-1)
        else:
            bbox = bbox / sf[:, None, :]
        all_boxes.append(bbox)
        all_scores.append(scores)
    bbox = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    return batched_nms(bbox, scores, score_thr, iou_thr, max_per_img,
                       nms_pre=nms_pre)


def single_device_test(model, variables, dataset, batch_size: int = 8,
                       img_size: int = 640, max_gts: int = 0,
                       progress: bool = True) -> List[List[np.ndarray]]:
    """Run detection over a test-mode dataset; returns per-image per-class
    results aligned with dataset order."""
    import jax

    from ..data.loader import DetDataLoader

    # single-stage heads, two-stage roi heads, or proposal-only RPN
    if hasattr(model, 'bbox_head'):
        num_classes = model.bbox_head.num_classes
    elif hasattr(model, 'roi_head'):
        num_classes = model.roi_head.num_classes
    else:
        num_classes = 1

    @jax.jit
    def infer(variables, img, scale_factor):
        pred_maps = model.apply(variables, img)
        return model.get_bboxes(pred_maps, scale_factors=scale_factor)

    loader = DetDataLoader(dataset, batch_size=batch_size, max_gts=1,
                           img_size=img_size, shuffle=False, drop_last=False)
    results: List[Optional[list]] = [None] * len(dataset)
    done = 0
    for batch in loader:
        res = infer(variables, batch['img'], batch['scale_factor'])
        per_img = nms_result_to_per_class(res, num_classes)
        for out, meta in zip(per_img, batch['img_metas']):
            if results[meta['_idx']] is None:
                results[meta['_idx']] = out
        done += len(batch['img_metas'])
        if progress and done % (batch_size * 20) == 0:
            print(f'tested {done}/{len(dataset)}')
    return [r for r in results if r is not None]
