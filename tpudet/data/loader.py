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
            scale_factor[i] = s.get('scale_factor', np.ones(4, np.float32))
            meta.append({
                'ori_shape': s.get('ori_shape'),
                'img_shape': s.get('img_shape'),
                'pad_shape': s.get('pad_shape'),
                'scale_factor': scale_factor[i],
                'filename': s.get('filename'),
                '_idx': s.get('_idx'),
            })
        return dict(img=img, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                    gt_valid=gt_valid, scale_factor=scale_factor,
                    img_metas=meta)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        nb = len(self)
        q: Queue = Queue(maxsize=self.prefetch)
        batches = [
            indices[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        def worker():
            for batch_idx in batches:
                samples = [self.dataset[int(i)] for i in batch_idx]
                q.put(self._collate(samples))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
