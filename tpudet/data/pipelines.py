"""Host-side data pipeline transforms (numpy/cv2).

Capability rebuild of the reference pipeline zoo used by the YOLO configs
(mmdet/datasets/pipelines/: LoadImageFromFile loading.py:12, Resize
transforms.py:27, Normalize :638, Pad :568, RandomFlip, MosaicPipeline
:1906, HueSaturationValueJitter :1990, GtBBoxesFilter :2028, and the Albu
pad/crop/scale/crop/flip chain configured at
configs/yolov4/yolov4l_coco_mosaic.py:31-59 — rebuilt natively as
``RandomAffineChain``, no albumentations dependency).

A transform maps a ``results`` dict to a dict. Keys: ``img`` (HWC uint8
BGR until Normalize, float32 RGB after), ``gt_bboxes`` (N, 4 xyxy float32),
``gt_labels`` (N,), ``img_shape``, ``ori_shape``, ``pad_shape``,
``scale_factor``.

These run on host workers; the fixed-640 outputs feed the device. (The
on-device fused mosaic/affine path is the planned fast path; this is the
semantics-defining implementation.)
"""
from __future__ import annotations

import os.path as osp
import random
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..registry import PIPELINES, build_from_cfg


class Compose:

    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(t, PIPELINES))
            else:
                self.transforms.append(t)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


@PIPELINES.register_module()
class LoadImageFromFile:
    """File -> BGR uint8 ndarray (reference loading.py:12-103).

    ``im_decode_backend='turbojpeg'`` mirrors the reference's per-pipeline
    decode-backend selection (reference loading.py:35-41, config
    configs/yolov4/yolov4l_coco_mosaic.py:26): JPEG files decode through
    the native C++ loader (tpudet/ops/native/jpeg_loader.cc — libjpeg-
    turbo, GIL-free), anything else falls back to cv2. Output is
    bit-identical between the two backends for baseline JPEGs (parity
    test: tests/test_data/test_jpeg_native.py).
    """

    def __init__(self, to_float32=False, im_decode_backend='cv2', **kwargs):
        self.to_float32 = to_float32
        self.native = im_decode_backend in ('turbojpeg', 'native')

    def _read(self, filename):
        if self.native:
            try:
                with open(filename, 'rb') as f:
                    data = f.read()
            except OSError:
                raise FileNotFoundError(filename)
            if data[:2] == b'\xff\xd8':  # JPEG magic
                from tpudet.ops.native import jpeg_native
                img = jpeg_native.decode(data, bgr=True)
                if img is not None:
                    return img
            return cv2.imdecode(np.frombuffer(data, np.uint8),
                                cv2.IMREAD_COLOR)
        return cv2.imread(filename, cv2.IMREAD_COLOR)

    def __call__(self, results):
        img_info = results['img_info']
        prefix = results.get('img_prefix') or ''
        filename = osp.join(prefix, img_info['filename'])
        img = self._read(filename)
        if img is None:
            raise FileNotFoundError(filename)
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = filename
        results['ori_filename'] = img_info['filename']
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = np.array([1., 1., 1., 1.], np.float32)
        results['img_fields'] = ['img']
        results['bbox_fields'] = []
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    """ann_info -> gt_bboxes/gt_labels (reference loading.py:205-265).

    ``with_mask`` rasterizes each gt's polygons into its OWN bbox frame at
    ``mask_frame_size`` (a scale-invariant representation — see
    tpudet/core/mask.py): geometric transforms move the box, not the
    box-frame mask; only flips mirror it and filters drop it.
    """

    def __init__(self, with_bbox=True, with_label=True, with_mask=False,
                 mask_frame_size=28, **kwargs):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.mask_frame_size = mask_frame_size

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox:
            results['gt_bboxes'] = ann['bboxes'].copy()
            results['bbox_fields'] = results.get('bbox_fields',
                                                 []) + ['gt_bboxes']
        if self.with_label:
            results['gt_labels'] = ann['labels'].copy()
        if self.with_mask:
            from ..core.mask import polygons_to_gt_frame_mask
            masks = []
            polys = ann.get('masks') or [None] * len(ann['bboxes'])
            for box, seg in zip(ann['bboxes'], polys):
                if seg and isinstance(seg, (list, tuple)):
                    masks.append(polygons_to_gt_frame_mask(
                        seg, box, self.mask_frame_size))
                else:  # missing/RLE segmentation: full-box mask
                    masks.append(np.ones(
                        (self.mask_frame_size, self.mask_frame_size),
                        np.float32))
            results['gt_frame_masks'] = (
                np.stack(masks) if masks else
                np.zeros((0, self.mask_frame_size, self.mask_frame_size),
                         np.float32))
        return results


def rescale_size(h: int, w: int, scale: Tuple[int, int]):
    """mmcv imrescale sizing: fit within (max_long, max_short)."""
    max_long, max_short = max(scale), min(scale)
    factor = min(max_long / max(h, w), max_short / min(h, w))
    return int(w * factor + 0.5), int(h * factor + 0.5)


@PIPELINES.register_module()
class Resize:
    """keep_ratio letterbox-half resize (reference transforms.py:27-318:
    mmcv.imrescale + recorded (w, h, w, h) scale_factor).

    Multi-scale training (reference ``Resize.random_select`` /
    ``random_sample``, transforms.py:100-140): pass a LIST of (long,
    short) scales — ``multiscale_mode='value'`` picks one per sample,
    ``'range'`` (with exactly two scales) samples each edge uniformly
    between them. Used by the mstrain config variants
    (e.g. configs/retinanet/retinanet_r50_fpn_mstrain_1x_coco.py).
    """

    def __init__(self, img_scale=None, keep_ratio=True, backend='cv2',
                 multiscale_mode='range'):
        if (isinstance(img_scale, (list, tuple)) and img_scale
                and isinstance(img_scale[0], (list, tuple))):
            self.img_scale = [tuple(s) for s in img_scale]
        elif img_scale is not None:
            if not isinstance(img_scale, (list, tuple)):
                img_scale = (img_scale, img_scale)
            self.img_scale = tuple(img_scale)
        else:
            self.img_scale = None
        assert multiscale_mode in ('value', 'range')
        self.multiscale_mode = multiscale_mode
        self.keep_ratio = keep_ratio

    def _pick_scale(self):
        if not isinstance(self.img_scale, list):
            return self.img_scale
        if self.multiscale_mode == 'value' or len(self.img_scale) != 2:
            return random.choice(self.img_scale)
        (l0, s0), (l1, s1) = self.img_scale
        return (random.randint(min(l0, l1), max(l0, l1)),
                random.randint(min(s0, s1), max(s0, s1)))

    def __call__(self, results):
        scale = results.get('scale', None)
        if scale is None:
            scale = self._pick_scale()
        img = results['img']
        h, w = img.shape[:2]
        if self.keep_ratio:
            new_w, new_h = rescale_size(h, w, scale)
        else:
            new_w, new_h = scale
        resized = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
        w_scale = new_w / w
        h_scale = new_h / h
        results['img'] = resized
        results['img_shape'] = resized.shape
        results['pad_shape'] = resized.shape
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        for key in results.get('bbox_fields', []):
            bboxes = results[key] * results['scale_factor']
            bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, new_w)
            bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, new_h)
            results[key] = bboxes
        return results


@PIPELINES.register_module()
class RandomFlip:
    """Horizontal flip (reference transforms.py:321-440)."""

    def __init__(self, flip_ratio=None, direction='horizontal'):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results):
        flip = (self.flip_ratio is not None
                and random.random() < self.flip_ratio)
        results['flip'] = flip
        results['flip_direction'] = self.direction if flip else None
        if flip:
            results['img'] = np.ascontiguousarray(results['img'][:, ::-1])
            h, w = results['img'].shape[:2]
            for key in results.get('bbox_fields', []):
                b = results[key].copy()
                b[:, 0] = w - results[key][:, 2]
                b[:, 2] = w - results[key][:, 0]
                results[key] = b
            if 'gt_frame_masks' in results:
                results['gt_frame_masks'] = \
                    results['gt_frame_masks'][:, :, ::-1].copy()
        return results


@PIPELINES.register_module()
class Pad:
    """Pad to fixed size or size divisor (reference transforms.py:568-636)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th = -(-h // d) * d
            tw = -(-w // d) * d
        padded = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        padded[:h, :w] = img
        results['img'] = padded
        results['pad_shape'] = padded.shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        return results


@PIPELINES.register_module()
class Normalize:
    """(img[, BGR->RGB] - mean) / std (reference transforms.py:638-682)."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class MosaicPipeline:
    """4-tile mosaic meta-transform (reference transforms.py:1906-1987):
    run ``individual_pipeline`` on the sample + 3 same-aspect-group
    partners, paste around the canvas center, offset and concat bboxes."""

    def __init__(self, individual_pipeline, pad_val=0):
        self.individual_pipeline = Compose(individual_pipeline)
        self.pad_val = pad_val

    def __call__(self, results):
        dataset = results['dataset']
        mosaic_results = [results]
        for idx in dataset.batch_rand_others(results['_idx'], 3):
            mosaic_results.append(dataset.prepare_input(idx))
        mosaic_results = [self.individual_pipeline(r) for r in mosaic_results]

        shapes = [r['pad_shape'] for r in mosaic_results]
        # canvas half-size: reference :1932-1933
        cxy = max(shapes[0][0], shapes[1][0], shapes[0][1], shapes[2][1])
        canvas = np.full((cxy * 2, cxy * 2, shapes[0][2]), self.pad_val,
                         np.uint8)
        all_bboxes, all_labels = [], []
        for i, r in enumerate(mosaic_results):
            h, w = r['pad_shape'][:2]
            if i == 0:  # top left, anchored to center
                x1, y1 = cxy - w, cxy - h
            elif i == 1:  # top right
                x1, y1 = cxy, cxy - h
            elif i == 2:  # bottom left
                x1, y1 = cxy - w, cxy
            else:  # bottom right
                x1, y1 = cxy, cxy
            canvas[y1:y1 + h, x1:x1 + w] = r['img']
            b = r['gt_bboxes'].copy()
            b[:, 0::2] += x1
            b[:, 1::2] += y1
            all_bboxes.append(b)
            all_labels.append(r['gt_labels'])

        out = mosaic_results[0]
        out['img'] = canvas
        out['gt_bboxes'] = np.concatenate(all_bboxes, axis=0)
        out['gt_labels'] = np.concatenate(all_labels, axis=0)
        out['img_shape'] = canvas.shape
        out['ori_shape'] = canvas.shape
        out['pad_shape'] = canvas.shape
        out['flip'] = False
        out['bbox_fields'] = ['gt_bboxes']
        return out


@PIPELINES.register_module()
class HueSaturationValueJitter:
    """YOLOv5-style HSV gain jitter via 256-entry LUTs, on BGR uint8
    (reference transforms.py:1990-2025)."""

    def __init__(self, hue_ratio=0.5, saturation_ratio=0.5, value_ratio=0.5):
        self.h_ratio = hue_ratio
        self.s_ratio = saturation_ratio
        self.v_ratio = value_ratio

    def __call__(self, results):
        img = np.ascontiguousarray(results['img'])
        r = np.array([random.uniform(-1., 1.) for _ in range(3)]) * \
            [self.h_ratio, self.s_ratio, self.v_ratio] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=np.int16)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                             cv2.LUT(val, lut_val)))
        results['img'] = cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR)
        return results


@PIPELINES.register_module()
class GtBBoxesFilter:
    """Drop degenerate boxes after augmentation
    (reference transforms.py:2028-2052)."""

    def __init__(self, min_size=2, max_aspect_ratio=20):
        assert max_aspect_ratio > 1
        self.min_size = min_size
        self.max_aspect_ratio = max_aspect_ratio

    def __call__(self, results):
        bboxes = results['gt_bboxes']
        w = bboxes[:, 2] - bboxes[:, 0]
        h = bboxes[:, 3] - bboxes[:, 1]
        ar = np.maximum(w / (h + 1e-16), h / (w + 1e-16))
        valid = (w > self.min_size) & (h > self.min_size) & \
                (ar < self.max_aspect_ratio)
        results['gt_bboxes'] = bboxes[valid]
        results['gt_labels'] = results['gt_labels'][valid]
        if 'gt_frame_masks' in results:
            results['gt_frame_masks'] = results['gt_frame_masks'][valid]
        return results


@PIPELINES.register_module()
class RandomAffineChain:
    """Native rebuild of the YOLO configs' Albu random-affine substitute
    (configs/yolov4/yolov4l_coco_mosaic.py:31-59): center-pad to
    ``pad_to``, random-crop ``crop``, random scale by 1 +/- scale_limit,
    center-crop ``out``, horizontal flip; boxes filtered by min_area and
    min_visibility like albumentations BboxParams.
    """

    def __init__(self, pad_to=1920, crop=1280, scale_limit=0.5, out=640,
                 hflip_p=0.5, pad_val=114, min_area=4, min_visibility=0.2):
        self.pad_to = pad_to
        self.crop = crop
        self.scale_limit = scale_limit
        self.out = out
        self.hflip_p = hflip_p
        self.pad_val = pad_val
        self.min_area = min_area
        self.min_visibility = min_visibility

    def __call__(self, results):
        img = results['img']
        bboxes = results['gt_bboxes'].astype(np.float64)
        labels = results['gt_labels']
        h, w = img.shape[:2]
        # normalized area before the chain (albu visibility is computed in
        # normalized coords, so pure scaling does not reduce it)
        area0 = ((bboxes[:, 2] - bboxes[:, 0]) *
                 (bboxes[:, 3] - bboxes[:, 1]) / max(h * w, 1))

        # 1) center pad to at least pad_to
        ph = max(self.pad_to, h)
        pw = max(self.pad_to, w)
        top = (ph - h) // 2
        left = (pw - w) // 2
        canvas = np.full((ph, pw, img.shape[2]), self.pad_val, img.dtype)
        canvas[top:top + h, left:left + w] = img
        bboxes[:, 0::2] += left
        bboxes[:, 1::2] += top
        img, h, w = canvas, ph, pw

        # 2) random crop
        c = self.crop
        y0 = random.randint(0, max(h - c, 0))
        x0 = random.randint(0, max(w - c, 0))
        img = img[y0:y0 + c, x0:x0 + c]
        bboxes[:, 0::2] -= x0
        bboxes[:, 1::2] -= y0
        h = w = c

        # 3) random scale
        f = 1.0 + random.uniform(-self.scale_limit, self.scale_limit)
        nh, nw = int(h * f), int(w * f)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        bboxes *= [nw / w, nh / h, nw / w, nh / h]
        h, w = nh, nw

        # 4) center crop to out (pad first if smaller)
        o = self.out
        if h < o or w < o:
            canvas = np.full((max(h, o), max(w, o), img.shape[2]),
                             self.pad_val, img.dtype)
            t = (canvas.shape[0] - h) // 2
            l = (canvas.shape[1] - w) // 2
            canvas[t:t + h, l:l + w] = img
            bboxes[:, 0::2] += l
            bboxes[:, 1::2] += t
            img = canvas
            h, w = img.shape[:2]
        y0 = (h - o) // 2
        x0 = (w - o) // 2
        img = img[y0:y0 + o, x0:x0 + o]
        bboxes[:, 0::2] -= x0
        bboxes[:, 1::2] -= y0

        # 5) horizontal flip
        if random.random() < self.hflip_p:
            img = np.ascontiguousarray(img[:, ::-1])
            x1 = o - bboxes[:, 2].copy()
            x2 = o - bboxes[:, 0].copy()
            bboxes[:, 0], bboxes[:, 2] = x1, x2

        # clip + filter (albu BboxParams: min_area, min_visibility)
        clipped = bboxes.copy()
        clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, o)
        clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, o)
        area = ((clipped[:, 2] - clipped[:, 0]) *
                (clipped[:, 3] - clipped[:, 1]))
        visibility = (area / (o * o)) / np.maximum(area0, 1e-12)
        keep = (area >= self.min_area) & (visibility >= self.min_visibility)

        results['img'] = img
        results['gt_bboxes'] = clipped[keep].astype(np.float32)
        results['gt_labels'] = labels[keep]
        if 'gt_frame_masks' in results:
            results['gt_frame_masks'] = results['gt_frame_masks'][keep]
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        return results


@PIPELINES.register_module()
class MultiScaleFlipAug:
    """Test-time wrapper; YOLO configs use a single (640,640) no-flip aug
    (reference test_time_aug.py:10, configs/yolov4/*:72-83)."""

    def __init__(self, transforms, img_scale, flip=False,
                 flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        self.img_scale = img_scale if isinstance(img_scale,
                                                 list) else [img_scale]
        self.flip = flip

    def __call__(self, results):
        aug_results = []
        flips = [False, True] if self.flip else [False]
        for scale in self.img_scale:
            for f in flips:
                r = dict(results)
                r['scale'] = tuple(scale)
                r['flip'] = f
                aug_results.append(self.transforms(r))
        # single-aug fast path returns the plain dict
        return aug_results[0] if len(aug_results) == 1 else aug_results


@PIPELINES.register_module()
class Corrupt:
    """Apply a named robustness-benchmark corruption (reference
    pipelines/transforms.py Corrupt, backed by the native
    tpudet.data.corruptions implementations instead of the external
    imagecorruptions package). Operates on the BGR pipeline image."""

    def __init__(self, corruption: str, severity: int = 1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        if self.severity == 0:
            return results
        import zlib

        from .corruptions import corrupt
        img = results['img']
        rgb = np.ascontiguousarray(img[..., ::-1])
        # stable per-image seed (Python hash() is randomized per process)
        name = results.get('ori_filename', '') or ''
        seed = zlib.crc32(name.encode()) & 0xffff
        out = corrupt(rgb, self.corruption, self.severity, seed=seed)
        results['img'] = np.ascontiguousarray(out[..., ::-1])
        return results


@PIPELINES.register_module()
class InstaBoost:
    """Instance-jitter copy-paste augmentation.

    Capability analogue of the reference's InstaBoost wrapper
    (mmdet/datasets/pipelines/instaboost.py — which delegates to the
    `instaboostfast` pip package, unavailable here): with probability
    ``prob``, each instance is cut out along its (box-frame) mask,
    translated/flipped by a small random offset, and pasted back; the
    hole is filled with local background. gt boxes move with their
    instances. Runs BEFORE Resize, on the raw image.
    """

    def __init__(self, prob=0.5, max_shift_ratio=0.2, flip_prob=0.5,
                 min_size=8):
        self.prob = prob
        self.max_shift_ratio = max_shift_ratio
        self.flip_prob = flip_prob
        self.min_size = min_size

    def _paste_one(self, img, box, frame_mask, rng):
        import cv2
        h, w = img.shape[:2]
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w), min(y2, h)
        bw, bh = x2 - x1, y2 - y1
        if bw < self.min_size or bh < self.min_size:
            return box
        patch = img[y1:y2, x1:x2].copy()
        mask = cv2.resize(frame_mask.astype(np.float32), (bw, bh),
                          interpolation=cv2.INTER_LINEAR) > 0.5
        dx = int(rng.uniform(-self.max_shift_ratio,
                             self.max_shift_ratio) * bw)
        dy = int(rng.uniform(-self.max_shift_ratio,
                             self.max_shift_ratio) * bh)
        flip = rng.rand() < self.flip_prob
        if flip:
            patch = patch[:, ::-1]
            mask = mask[:, ::-1]
        nx1 = int(np.clip(x1 + dx, 0, w - bw))
        ny1 = int(np.clip(y1 + dy, 0, h - bh))
        # fill the hole with the local median color (cheap inpaint)
        region = img[y1:y2, x1:x2]
        fill = np.median(region.reshape(-1, region.shape[-1]),
                         axis=0).astype(img.dtype)
        region[mask] = fill
        # paste at the new location
        dst = img[ny1:ny1 + bh, nx1:nx1 + bw]
        dst[mask] = patch[mask]
        return np.array([nx1, ny1, nx1 + bw, ny1 + bh], np.float32)

    def __call__(self, results):
        if 'gt_frame_masks' not in results or \
                len(results.get('gt_bboxes', ())) == 0:
            return results
        rng = np.random
        img = results['img']
        boxes = results['gt_bboxes']
        masks = results['gt_frame_masks']
        for i in range(len(boxes)):
            if rng.rand() >= self.prob:
                continue
            boxes[i] = self._paste_one(img, boxes[i], masks[i],
                                       np.random)
        results['img'] = img
        results['gt_bboxes'] = boxes
        return results
