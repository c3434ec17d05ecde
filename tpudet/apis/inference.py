"""Inference API mirroring the reference's public surface
(mmdet/apis/inference.py:16 init_detector, :89 inference_detector).

``init_detector(config, checkpoint)`` returns a :class:`Detector` bundling
the flax module, its variables, the compiled end-to-end program
(forward -> decode -> NMS for the whole batch) and the test pipeline.
``inference_detector`` accepts an image path or ndarray and returns the
reference's result format: a list of per-class (n, 5) numpy arrays.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from ..config import Config
from ..data.dataset import COCO_CLASSES
from ..data.pipelines import Compose
from ..models.builder import build_detector
from ..utils.checkpoint import load_variables


class Detector:
    """A built detector + weights + compiled inference program."""

    def __init__(self, model, variables, cfg: Optional[Config] = None,
                 classes: Sequence[str] = COCO_CLASSES):
        import jax

        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.CLASSES = tuple(classes)
        test_pipeline = None
        if cfg is not None and 'data' in cfg:
            test_pipeline = cfg['data']['test']['pipeline']
        if test_pipeline is None:
            test_pipeline = [
                dict(type='LoadImageFromFile'),
                dict(type='MultiScaleFlipAug', img_scale=(640, 640),
                     flip=False,
                     transforms=[
                         dict(type='Resize', keep_ratio=True),
                         dict(type='RandomFlip'),
                         dict(type='Pad', size_divisor=32),
                         dict(type='Normalize', mean=[114, 114, 114],
                              std=[255, 255, 255], to_rgb=True),
                     ])
            ]
        self.pipeline = Compose(test_pipeline)

        @functools.partial(jax.jit, static_argnames=('rescale',))
        def _infer(variables, img, scale_factor, rescale=True):
            pred_maps = self.model.apply(variables, img)
            return self.model.get_bboxes(
                pred_maps,
                scale_factors=scale_factor if rescale else None)

        self._infer = _infer

    def __call__(self, img: np.ndarray, scale_factor: np.ndarray,
                 rescale: bool = True):
        return self._infer(self.variables, img, scale_factor,
                           rescale=rescale)


def init_detector(config: Union[str, Config, Dict],
                  checkpoint: Optional[str] = None,
                  classes: Sequence[str] = COCO_CLASSES) -> Detector:
    """Build a detector from config (+ optional checkpoint), eval-ready.

    Reference analogue: apis/inference.py:16-60 (build, load_checkpoint,
    CLASSES from meta, eval mode — eval mode is implicit here: inference
    uses running BN stats by construction).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(config, str):
        config = Config.fromfile(config)
    cfg = config if isinstance(config, Config) else Config(dict(model=config))
    model = build_detector(cfg['model'])
    if checkpoint is not None:
        variables, meta = load_variables(checkpoint)
        classes = meta.get('CLASSES', classes)
    else:
        img0 = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0)
        # mask branches are not touched by __call__; union their params
        # in so predict_masks works on a fresh (untrained) detector
        from .test import _mask_mode
        mode = _mask_mode(model)
        if mode in ('roi', 'roi_labels'):
            import flax
            boxes = jnp.zeros((1, 4, 4))
            valid = jnp.zeros((1, 4), bool)
            args = (img0, boxes, valid)
            if mode == 'roi_labels':
                args += (jnp.zeros((1, 4), jnp.int32),)
            mask_vars = jax.jit(
                model.init, static_argnames=('method',))(
                    jax.random.PRNGKey(0), *args, method='predict_masks')
            def deep_merge(base, extra):
                out = dict(base)
                for k, v in extra.items():
                    if k in out and isinstance(out[k], dict) and \
                            isinstance(v, dict):
                        out[k] = deep_merge(out[k], v)
                    else:
                        out.setdefault(k, v)
                return out

            variables = deep_merge(flax.core.unfreeze(variables),
                                   flax.core.unfreeze(mask_vars))
    return Detector(model, variables, cfg, classes)


def _prepare_image(detector: Detector, img: Union[str, np.ndarray]):
    if isinstance(img, str):
        results = detector.pipeline(
            dict(img_info=dict(filename=img), img_prefix=None))
    else:
        results = dict(
            img=img, img_shape=img.shape, ori_shape=img.shape,
            pad_shape=img.shape,
            scale_factor=np.ones(4, np.float32),
            img_fields=['img'], bbox_fields=[])
        # skip the loader stage of the pipeline
        for t in detector.pipeline.transforms[1:]:
            results = t(results)
    return results


def _pad_canvas(image: np.ndarray, pad_to: Optional[int],
                divisor: int = 32) -> np.ndarray:
    """Zero-pad to a square static shape: at least ``pad_to``, never
    smaller than the image, rounded up to the pipeline's pad divisor
    (32 for FPN models; 128 for hourglass/CornerNet pipelines)."""
    h, w = image.shape[:2]
    side = max(pad_to or 0, max(h, w))
    side = -(-side // divisor) * divisor
    canvas = np.zeros((side, side, 3), np.float32)
    canvas[:h, :w] = image
    return canvas


def _pipeline_pad_divisor(detector) -> int:
    """The Pad size_divisor of the detector's test pipeline (if any),
    descending into wrappers like MultiScaleFlipAug."""

    def scan(transforms):
        for t in transforms:
            d = getattr(t, 'size_divisor', None)
            if d:
                return int(d)
            inner = getattr(t, 'transforms', None)
            if inner is not None:
                d = scan(getattr(inner, 'transforms', inner))
                if d:
                    return d
        return 0

    return scan(getattr(detector.pipeline, 'transforms', [])) or 32


def inference_detector(detector: Detector,
                       img: Union[str, np.ndarray],
                       pad_to: Optional[int] = 640,
                       with_masks: bool = False,
                       mask_thr: float = 0.5):
    """Single-image inference returning per-class (n, 5) arrays
    (reference apis/inference.py:89-152 contract).

    ``with_masks=True`` on a mask-capable detector returns the
    reference's ``(bbox_result, segm_result)`` two-tuple with per-class
    RLE lists."""
    results = _prepare_image(detector, img)
    image = results['img'].astype(np.float32)
    if pad_to is not None:
        image = _pad_canvas(image, pad_to,
                            divisor=_pipeline_pad_divisor(detector))
    batch_img = image[None]
    scale_factor = np.asarray(results['scale_factor'],
                              np.float32).reshape(1, 4)
    if with_masks:
        import jax
        import jax.numpy as jnp

        from .test import _mask_mode, masks_to_segm_results
        model = detector.model
        mode = _mask_mode(model)
        if mode is None:
            raise ValueError(
                f'{type(model).__name__} has no mask branch')
        outputs = model.apply(detector.variables, batch_img)
        if mode == 'proto':
            res, probs = model.predict_masks(outputs,
                                             scale_factors=scale_factor)
        else:
            res = model.get_bboxes(outputs, scale_factors=scale_factor)
            in_boxes = res.bboxes * scale_factor[:, None, :]
            if mode == 'roi_labels':
                probs = model.apply(detector.variables, batch_img, in_boxes,
                                    res.valid, res.labels,
                                    method='predict_masks')
            else:
                probs = model.apply(detector.variables, batch_img, in_boxes,
                                    res.valid, method='predict_masks')
            if probs.ndim == 5:
                cls_idx = jnp.clip(res.labels, 0, probs.shape[-1] - 1)
                probs = jnp.take_along_axis(
                    probs, cls_idx[:, :, None, None, None], axis=-1)[..., 0]
        ori = results.get('ori_shape') or image.shape[:2]
        metas = [dict(ori_shape=ori)]
        segm = masks_to_segm_results(probs, res, metas,
                                     len(detector.CLASSES), mask_thr)[0]
        bbox = nms_result_to_per_class(res, len(detector.CLASSES))[0]
        return bbox, segm
    res = detector(batch_img, scale_factor, rescale=True)
    return nms_result_to_per_class(res, len(detector.CLASSES))[0]


async def async_inference_detector(detector: Detector,
                                   img: Union[str, np.ndarray],
                                   pad_to: Optional[int] = 640):
    """Async single-image inference (reference apis/inference.py:155).

    JAX dispatch is already asynchronous; this coroutine yields control
    while the device computes, then fetches.
    """
    import asyncio

    results = _prepare_image(detector, img)
    image = results['img'].astype(np.float32)
    if pad_to is not None:
        image = _pad_canvas(image, pad_to)
    scale_factor = np.asarray(results['scale_factor'],
                              np.float32).reshape(1, 4)
    res = detector(image[None], scale_factor, rescale=True)  # async dispatch
    await asyncio.sleep(0)  # let other tasks run while the device works
    return nms_result_to_per_class(res, len(detector.CLASSES))[0]


def nms_result_to_per_class(res, num_classes: int) -> List[List[np.ndarray]]:
    """Padded NMSResult -> reference bbox2result format
    (per image, per class (n, 5) arrays; detectors/base.py bbox2result)."""
    bboxes = np.asarray(res.bboxes)
    scores = np.asarray(res.scores)
    labels = np.asarray(res.labels)
    valid = np.asarray(res.valid)
    out = []
    for i in range(bboxes.shape[0]):
        per_cls = []
        v = valid[i]
        dets = np.concatenate([bboxes[i][v], scores[i][v][:, None]],
                              axis=-1).astype(np.float32)
        lab = labels[i][v]
        for c in range(num_classes):
            per_cls.append(dets[lab == c])
        out.append(per_cls)
    return out
