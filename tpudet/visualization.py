"""Detection/instance-seg visualization
(reference mmdet/core/visualization/image.py analogue: imshow_det_bboxes
with mask overlays + imshow_gt_det_bboxes side-by-side view)."""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import cv2
import numpy as np


def _palette(n: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    return {c: tuple(int(x) for x in rng.randint(0, 255, 3))
            for c in range(max(n, 1))}


def _as_bitmap(segm, h: int, w: int) -> np.ndarray:
    from .core.mask import segmentation_to_bitmap
    if isinstance(segm, np.ndarray) and segm.ndim == 2:
        return segm.astype(np.uint8)
    return segmentation_to_bitmap(segm, h, w)


def imshow_det_bboxes(img: Union[str, np.ndarray],
                      result,
                      class_names: Sequence[str],
                      score_thr: float = 0.3,
                      thickness: int = 2,
                      font_scale: float = 0.5,
                      mask_alpha: float = 0.45,
                      out_file: Optional[str] = None) -> np.ndarray:
    """Draw per-class detection arrays (and instance masks) onto the
    image (BGR).

    ``result`` is either the bbox-only per-class list or the reference's
    two-tuple ``(bbox_results, segm_results)`` with per-class RLE/bitmap
    lists (detectors/base.py show_result semantics).
    """
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]

    segm_result = None
    if isinstance(result, tuple) and len(result) == 2:
        result, segm_result = result
    colors = _palette(len(class_names))

    for cls, dets in enumerate(result):
        for j, det in enumerate(dets):
            if det[4] < score_thr:
                continue
            color = colors[cls]
            if segm_result is not None and j < len(segm_result[cls]):
                mask = _as_bitmap(segm_result[cls][j], h, w).astype(bool)
                overlay = img.copy()
                overlay[mask] = color
                cv2.addWeighted(overlay, mask_alpha, img, 1 - mask_alpha, 0,
                                img)
            x1, y1, x2, y2 = (int(v) for v in det[:4])
            cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
            label = f'{class_names[cls]}: {det[4]:.2f}'
            cv2.putText(img, label, (x1, max(y1 - 4, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, 1)
    if out_file is not None:
        cv2.imwrite(out_file, img)
    return img


def imshow_gt_det_bboxes(img: Union[str, np.ndarray],
                         annotation: Dict,
                         result,
                         class_names: Sequence[str],
                         score_thr: float = 0.3,
                         out_file: Optional[str] = None) -> np.ndarray:
    """Side-by-side ground-truth vs prediction view (reference
    core/visualization/image.py imshow_gt_det_bboxes).

    ``annotation`` carries gt_bboxes (xyxy), gt_labels, and optionally
    gt_masks (COCO segmentations).
    """
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    colors = _palette(len(class_names))

    gt_img = img.copy()
    gt_bboxes = np.asarray(annotation['gt_bboxes'])
    gt_labels = np.asarray(annotation['gt_labels'])
    gt_masks = annotation.get('gt_masks')
    for i in range(len(gt_bboxes)):
        cls = int(gt_labels[i])
        color = colors.get(cls, (0, 255, 0))
        if gt_masks is not None and i < len(gt_masks) and \
                gt_masks[i] is not None:
            mask = _as_bitmap(gt_masks[i], h, w).astype(bool)
            overlay = gt_img.copy()
            overlay[mask] = color
            cv2.addWeighted(overlay, 0.45, gt_img, 0.55, 0, gt_img)
        x1, y1, x2, y2 = (int(v) for v in gt_bboxes[i])
        cv2.rectangle(gt_img, (x1, y1), (x2, y2), color, 2)
        name = class_names[cls] if cls < len(class_names) else str(cls)
        cv2.putText(gt_img, f'gt: {name}', (x1, max(y1 - 4, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)

    det_img = imshow_det_bboxes(img.copy(), result, class_names,
                                score_thr=score_thr)
    canvas = np.concatenate([gt_img, det_img], axis=1)
    if out_file is not None:
        cv2.imwrite(out_file, canvas)
    return canvas
