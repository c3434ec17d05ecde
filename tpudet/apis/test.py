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
        out = model.bbox_head.get_bboxes(pred_maps, with_nms=False)
        bbox, scores = out[0], out[1]  # yolov3's raw return adds conf
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


def _mask_mode(model):
    """Classify the detector's mask-prediction API, if any."""
    import inspect
    if not hasattr(model, 'predict_masks'):
        return None
    params = list(inspect.signature(model.predict_masks).parameters)
    if 'outputs' in params:
        return 'proto'  # YOLACT: predict_masks(outputs) -> (res, masks)
    if 'det_labels' in params:
        return 'roi_labels'  # PointRend: (img, boxes, valid, labels)
    return 'roi'  # Mask R-CNN family: (img, boxes, valid) -> (B,D,s,s,C)


def masks_to_segm_results(mask_probs, res, metas, num_classes,
                          mask_thr: float = 0.5):
    """Paste per-detection mask probs into original image frames and
    return reference-format per-image per-class RLE lists
    (mmdet/core/mask/utils.py encode_mask_results analogue)."""
    from ..core.mask import encode_rle, paste_mask_probs

    bboxes = np.asarray(res.bboxes)
    labels = np.asarray(res.labels)
    valid = np.asarray(res.valid)
    probs = np.asarray(mask_probs)
    out = []
    for i, meta in enumerate(metas):
        h, w = meta['ori_shape'][:2]
        v = valid[i]
        full = paste_mask_probs(probs[i][v], bboxes[i][v], h, w, mask_thr)
        lab = labels[i][v]
        per_cls = [[] for _ in range(num_classes)]
        for m, c in zip(full, lab):
            per_cls[int(c)].append(encode_rle(m))
        out.append(per_cls)
    return out


def _gather_object_shards(local: list, process_count: int):
    """All-gather python objects across hosts (reference
    apis/test.py:117-190 collect_results_cpu/gpu analogue): pickle ->
    padded uint8 arrays -> ``process_allgather`` -> merge."""
    import pickle

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(local), np.uint8)
    n = jnp.asarray([blob.size])
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    pad = int(sizes.max())
    padded = np.zeros(pad, np.uint8)
    padded[:blob.size] = blob
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded)))
    gathered = gathered.reshape(len(sizes), pad)
    shards = [
        pickle.loads(gathered[i, :int(sizes[i])].tobytes())
        for i in range(len(sizes))
    ]
    return shards


def merge_sharded_results(shards, total: int):
    """Merge per-host sparse result lists ([(idx, obj), ...]) into a
    dense dataset-ordered list; duplicate pad indices keep the first."""
    out = [None] * total
    for shard in shards:
        for idx, obj in shard:
            if out[idx] is None:
                out[idx] = obj
    return out


def single_device_test(model, variables, dataset, batch_size: int = 8,
                       img_size: int = 640, max_gts: int = 0,
                       progress: bool = True, with_masks: bool = False,
                       mask_thr: float = 0.5,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None,
                       gather: bool = True, tta: bool = False,
                       tta_score_thr: float = 0.001,
                       tta_iou_thr: float = 0.65,
                       tta_max_per_img: int = 300,
                       infer_fn=None):
    """Run detection over a test-mode dataset; returns per-image per-class
    results aligned with dataset order.

    Multi-host: each process evaluates a disjoint rank-strided shard of
    the val set (reference DistributedSampler + multi_gpu_test,
    apis/test.py:69-190) and the shards are all-gathered so every host
    returns the full, dataset-ordered result list. Pass
    ``process_index``/``process_count`` explicitly to shard without a
    jax distributed runtime (used by the single-host sharding tests);
    ``gather=False`` returns this host's sparse ``[(idx, result), ...]``.

    With ``with_masks=True`` (and a mask-capable detector) returns
    ``(bbox_results, segm_results)`` like the reference's two-tuple
    simple_test output (mmdet/models/detectors/two_stage.py simple_test
    + encode_mask_results).

    ``infer_fn`` overrides the default jitted inference closure on the
    plain (non-TTA, non-mask) path — used by the deployment eval tool
    (tools/deployment/test.py, the reference ONNXRuntimeDetector-eval
    analogue, tools/deployment/test.py:1-60) to drive a serialized
    exported model through the exact same eval protocol. Signature:
    ``infer_fn(variables, img, scale_factor, img_hw) -> NMSResult``."""
    import jax
    import jax.numpy as jnp

    from ..data.loader import DetDataLoader

    explicit_shard = process_count is not None
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index() if not explicit_shard else 0

    # single-stage heads, two-stage roi heads, or proposal-only RPN
    if hasattr(model, 'bbox_head'):
        num_classes = model.bbox_head.num_classes
    elif hasattr(model, 'roi_head'):
        num_classes = model.roi_head.num_classes
    else:
        num_classes = 1

    mode = _mask_mode(model) if with_masks else None
    if with_masks and mode is None:
        raise ValueError(f'{type(model).__name__} has no mask branch')

    if tta and mode is not None:
        raise ValueError('TTA with masks is not supported')

    if infer_fn is not None and (tta or with_masks):
        raise ValueError('infer_fn override only supports the plain path')

    @jax.jit
    def infer(variables, img, scale_factor, img_hw):
        pred_maps = model.apply(variables, img)
        # per-image (h, w) columns broadcast inside the heads' decode
        # clipping (reference _get_bboxes clips to each image's unpadded
        # img_shape before rescaling)
        return model.get_bboxes(pred_maps, scale_factors=scale_factor,
                                img_shape=(img_hw[:, 0:1], img_hw[:, 1:2]))

    @jax.jit
    def infer_tta(variables, img, scale_factor):
        # flip TTA (reference MultiScaleFlipAug flip=True +
        # aug_test_bboxes merge): identity + horizontal flip, merged
        # candidate sets, one NMS
        return tta_get_bboxes(
            model, variables,
            aug_imgs=[img, img[:, :, ::-1, :]],
            aug_scale_factors=[scale_factor, scale_factor],
            aug_flips=[False, True],
            score_thr=tta_score_thr, iou_thr=tta_iou_thr,
            max_per_img=tta_max_per_img)

    @jax.jit
    def infer_masks(variables, img, scale_factor):
        outputs = model.apply(variables, img)
        if mode == 'proto':
            res, masks = model.predict_masks(outputs,
                                             scale_factors=scale_factor)
            return res, masks
        res = model.get_bboxes(outputs, scale_factors=scale_factor)
        # roi pooling happens in the network input frame
        in_boxes = res.bboxes * scale_factor[:, None, :]
        if mode == 'roi_labels':
            probs = model.apply(variables, img, in_boxes, res.valid,
                                res.labels, method='predict_masks')
        else:
            probs = model.apply(variables, img, in_boxes, res.valid,
                                method='predict_masks')
        if probs.ndim == 5:  # (B, D, s, s, C): take the predicted class
            cls_idx = jnp.clip(res.labels, 0, probs.shape[-1] - 1)
            probs = jnp.take_along_axis(
                probs, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
        return res, probs

    loader = DetDataLoader(dataset, batch_size=batch_size, max_gts=1,
                           img_size=img_size, shuffle=False,
                           drop_last=False, process_index=process_index,
                           process_count=process_count)
    results: List[Optional[list]] = [None] * len(dataset)
    segms: List[Optional[list]] = [None] * len(dataset)
    done = 0
    for batch in loader:
        if tta:
            res = infer_tta(variables, batch['img'],
                            batch['scale_factor'])
        elif mode is None:
            img_hw = np.array([m['img_shape'][:2] if m.get('img_shape')
                               else batch['img'].shape[1:3]
                               for m in batch['img_metas']], np.float32)
            res = (infer_fn or infer)(variables, batch['img'],
                                      batch['scale_factor'], img_hw)
        else:
            res, mask_probs = infer_masks(variables, batch['img'],
                                          batch['scale_factor'])
            seg_batch = masks_to_segm_results(
                mask_probs, res, batch['img_metas'], num_classes, mask_thr)
            for seg, meta in zip(seg_batch, batch['img_metas']):
                if segms[meta['_idx']] is None:
                    segms[meta['_idx']] = seg
        per_img = nms_result_to_per_class(res, num_classes)
        for out, meta in zip(per_img, batch['img_metas']):
            if results[meta['_idx']] is None:
                results[meta['_idx']] = out
        done += len(batch['img_metas'])
        if progress and done % (batch_size * 20) == 0:
            print(f'tested {done}/{len(dataset)} (shard '
                  f'{process_index}/{process_count})')

    def pack(dense):
        return [(i, r) for i, r in enumerate(dense) if r is not None]

    if process_count > 1:
        local = pack(results) if mode is None else \
            [(i, (r, segms[i])) for i, r in enumerate(results)
             if r is not None]
        if not gather:
            return local
        if explicit_shard:
            # single-runtime sharding (tests): caller merges shards
            return local
        shards = _gather_object_shards(local, process_count)
        if mode is None:
            return merge_sharded_results(shards, len(dataset))
        merged = merge_sharded_results(shards, len(dataset))
        return ([m[0] for m in merged], [m[1] for m in merged])

    bbox_results = [r for r in results if r is not None]
    if mode is None:
        return bbox_results
    return bbox_results, [s for s in segms if s is not None]
