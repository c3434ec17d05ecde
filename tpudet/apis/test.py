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


def single_device_test(model, variables, dataset, batch_size: int = 8,
                       img_size: int = 640, max_gts: int = 0,
                       progress: bool = True) -> List[List[np.ndarray]]:
    """Run detection over a test-mode dataset; returns per-image per-class
    results aligned with dataset order."""
    import jax

    from ..data.loader import DetDataLoader

    num_classes = model.bbox_head.num_classes

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
