"""Batch loader: pipeline outputs -> fixed-shape padded device batches.

Replaces the reference's DataLoader + DataContainer + collate/scatter stack
(mmdet/datasets/builder.py:77, samplers/group_sampler.py:10,51) with the
TPU-shaped contract: every batch is a dict of *static-shape* arrays —
images padded to one resolution, gts padded to ``max_gts`` with a validity
mask — so a single compiled program serves the whole epoch.

Multi-host sharding mirrors DistributedGroupSampler semantics
(per-epoch-seeded shuffle, rank-strided indices) via
``process_index``/``process_count``.
"""
from __future__ import annotations

import threading
from queue import Queue
from typing import Dict, Iterator, Optional

import numpy as np


class DetDataLoader:

    def __init__(self,
                 dataset,
                 batch_size: int,
                 max_gts: int = 120,
                 img_size: Optional[int] = None,
                 shuffle: bool = True,
                 seed: int = 0,
                 drop_last: bool = True,
                 process_index: int = 0,
                 process_count: int = 1,
                 num_workers: int = 2,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gts = max_gts
        self.img_size = img_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Per-epoch reshuffle seed (reference group_sampler.py:62-70)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # rank-strided shard, padded to equal length across hosts
        shard = order[self.process_index::self.process_count]
        if not self.drop_last and len(order) % self.process_count:
            target = -(-n // self.process_count)
            if len(shard) < target:
                shard = np.concatenate([shard, shard[:target - len(shard)]])
        return shard

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        b = len(samples)
        if self.img_size is not None:
            h = w = self.img_size
        else:
            h = max(s['img'].shape[0] for s in samples)
            w = max(s['img'].shape[1] for s in samples)
        img = np.zeros((b, h, w, 3), np.float32)
        gt_bboxes = np.zeros((b, self.max_gts, 4), np.float32)
        gt_labels = np.zeros((b, self.max_gts), np.int32)
        gt_valid = np.zeros((b, self.max_gts), bool)
        scale_factor = np.ones((b, 4), np.float32)
        has_masks = any('gt_frame_masks' in s for s in samples)
        gt_frame_masks = None
        if has_masks:
            ms = next(s['gt_frame_masks'].shape[-1] for s in samples
                      if 'gt_frame_masks' in s)
            gt_frame_masks = np.zeros((b, self.max_gts, ms, ms), np.float32)
        meta = []
        for i, s in enumerate(samples):
            ih, iw = s['img'].shape[:2]
            img[i, :ih, :iw] = s['img']
            boxes = s.get('gt_bboxes')
            if boxes is not None and len(boxes):
                n = min(len(boxes), self.max_gts)
                gt_bboxes[i, :n] = boxes[:n]
                gt_labels[i, :n] = s['gt_labels'][:n]
                gt_valid[i, :n] = True
                if gt_frame_masks is not None and 'gt_frame_masks' in s:
                    gt_frame_masks[i, :n] = s['gt_frame_masks'][:n]
            scale_factor[i] = s.get('scale_factor', np.ones(4, np.float32))
            meta.append({
                'ori_shape': s.get('ori_shape'),
                'img_shape': s.get('img_shape'),
                'pad_shape': s.get('pad_shape'),
                'scale_factor': scale_factor[i],
                'filename': s.get('filename'),
                '_idx': s.get('_idx'),
            })
        out = dict(img=img, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                   gt_valid=gt_valid, scale_factor=scale_factor,
                   img_metas=meta)
        if gt_frame_masks is not None:
            out['gt_frame_masks'] = gt_frame_masks
        return out

    def _prefetch_iter(self, load_batch) -> Iterator[Dict[str, np.ndarray]]:
        """Threaded prefetch shared by the loader variants. A worker
        exception is forwarded through the queue and re-raised in the
        consumer — a silently-dead worker would otherwise block the
        training loop on ``q.get`` forever."""
        indices = self._indices()
        nb = len(self)
        q: Queue = Queue(maxsize=self.prefetch)
        batches = [
            indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        def worker():
            try:
                for batch_idx in batches:
                    q.put(load_batch(batch_idx))
            except BaseException as e:
                q.put(e)
                return
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._prefetch_iter(lambda batch_idx: self._collate(
            [self.dataset[int(i)] for i in batch_idx]))


class MosaicTileLoader(DetDataLoader):
    """Loader for the on-device augmentation path: the host pipeline only
    decodes + letterboxes tiles (uint8 BGR, no mosaic/affine/normalize);
    each batch element carries 4 tiles (self + 3 same-group partners,
    reference MosaicPipeline partner sampling custom.py:181-191) and the
    jitted :func:`tpudet.data.device_aug.device_mosaic_affine` does the
    rest on device. Host->device traffic is uint8 tiles — 4x lighter than
    normalized float32 canvases.
    """

    def __init__(self, dataset, batch_size, tile_size: int = 640,
                 max_gts_per_tile: int = 40, **kwargs):
        super().__init__(dataset, batch_size, img_size=tile_size, **kwargs)
        self.tile_size = tile_size
        self.max_gts_per_tile = max_gts_per_tile
        self._seed_rng = np.random.RandomState(self.seed + 7919)

    def set_epoch(self, epoch: int):
        super().set_epoch(epoch)
        self._seed_rng = np.random.RandomState(self.seed + 7919 + epoch)

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        b = len(samples)
        s = self.tile_size
        g = self.max_gts_per_tile
        tiles = np.zeros((b, 4, s, s, 3), np.uint8)
        tile_hw = np.zeros((b, 4, 2), np.int32)
        gt_bboxes = np.zeros((b, 4, g, 4), np.float32)
        gt_labels = np.zeros((b, 4, g), np.int32)
        gt_valid = np.zeros((b, 4, g), bool)
        for i, tile_group in enumerate(samples):
            for q_idx, t in enumerate(tile_group):
                img = t['img']
                h, w = img.shape[:2]
                tiles[i, q_idx, :h, :w] = img
                tile_hw[i, q_idx] = (h, w)
                boxes = t.get('gt_bboxes')
                if boxes is not None and len(boxes):
                    n = min(len(boxes), g)
                    gt_bboxes[i, q_idx, :n] = boxes[:n]
                    gt_labels[i, q_idx, :n] = t['gt_labels'][:n]
                    gt_valid[i, q_idx, :n] = True
        # per-image aug seeds: deterministic in (loader seed, epoch, draw)
        seeds = self._seed_rng.randint(0, 2**31 - 1, size=b).astype(np.int32)
        return dict(tiles=tiles, tile_hw=tile_hw, gt_bboxes=gt_bboxes,
                    gt_labels=gt_labels, gt_valid=gt_valid, aug_seed=seeds)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        def load_group(idx: int):
            partners = [idx] + self.dataset.batch_rand_others(idx, 3)
            return [self.dataset[int(i)] for i in partners]

        return self._prefetch_iter(lambda batch_idx: self._collate(
            [load_group(int(i)) for i in batch_idx]))
