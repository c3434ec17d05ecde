"""CustomDataset + dataset wrappers + fork-specific datasets.

Rebuild of reference mmdet/datasets/custom.py:17 (annotation-list dataset:
``data_infos`` entries with filename/width/height and an ``ann`` dict),
dataset_wrappers.py (Concat/Repeat/ClassBalanced), the fork's
TrafficSignDataset (tencent_traffic.py:11 — .circle annotation files) and
GarbageDataset (garbage.py — json annotation list), and an XML/VOC-style
dataset (xml_style.py, voc.py).
"""
from __future__ import annotations

import glob
import json
import math
import os.path as osp
import pickle
import random
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..registry import DATASETS
from .pipelines import Compose


@DATASETS.register_module()
class CustomDataset:
    """Annotation-list dataset (reference custom.py:17).

    ``ann_file`` is a pickle/json list of dicts:
    {'filename', 'width', 'height', 'ann': {'bboxes' (n,4) xyxy,
    'labels' (n,), optional 'bboxes_ignore'/'labels_ignore'}}.
    """
    CLASSES: Sequence[str] = ()

    def __init__(self,
                 ann_file: str,
                 pipeline: Sequence,
                 img_prefix: str = '',
                 classes: Optional[Sequence[str]] = None,
                 data_root: Optional[str] = None,
                 test_mode: bool = False,
                 filter_empty_gt: bool = True,
                 **kwargs):
        if classes is not None:
            self.CLASSES = tuple(classes)
        if data_root is not None:
            if not osp.isabs(ann_file):
                ann_file = osp.join(data_root, ann_file)
            if img_prefix and not osp.isabs(img_prefix):
                img_prefix = osp.join(data_root, img_prefix)
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.filter_empty_gt = filter_empty_gt
        self.data_infos = self.load_annotations(ann_file)
        if not test_mode and filter_empty_gt:
            self.data_infos = [
                d for d in self.data_infos
                if len(d.get('ann', {}).get('labels', ())) > 0
            ]
        self._set_group_flag()
        self.pipeline = Compose(pipeline)

    def load_annotations(self, ann_file: str) -> List[Dict]:
        if ann_file.endswith(('.pkl', '.pickle')):
            with open(ann_file, 'rb') as f:
                return pickle.load(f)
        with open(ann_file) as f:
            return json.load(f)

    def __len__(self):
        return len(self.data_infos)

    def _set_group_flag(self):
        self.flag = np.zeros(len(self), dtype=np.uint8)
        for i, info in enumerate(self.data_infos):
            if info.get('width', 1) / max(info.get('height', 1), 1) > 1:
                self.flag[i] = 1
        self._group_indices = {
            g: np.where(self.flag == g)[0]
            for g in np.unique(self.flag)
        }

    def batch_rand_others(self, idx: int, batch: int) -> List[int]:
        group = self._group_indices[self.flag[idx]]
        if len(group) <= 1:
            return [idx] * batch
        return [int(random.choice(group)) for _ in range(batch)]

    def get_ann_info(self, idx: int) -> Dict:
        ann = self.data_infos[idx].get('ann', {})
        bboxes = np.asarray(ann.get('bboxes', np.zeros((0, 4))),
                            np.float32).reshape(-1, 4)
        labels = np.asarray(ann.get('labels', []), np.int64)
        return dict(bboxes=bboxes, labels=labels)

    def get_ann_info_test(self, idx: int) -> Dict:
        ann = self.get_ann_info(idx)
        n = len(ann['labels'])
        area = ((ann['bboxes'][:, 2] - ann['bboxes'][:, 0]) *
                (ann['bboxes'][:, 3] - ann['bboxes'][:, 1]))
        return dict(gt_bboxes=ann['bboxes'], gt_labels=ann['labels'],
                    gt_attrs=dict(ignore=np.zeros(n, bool),
                                  iscrowd=np.zeros(n, bool),
                                  area=area.astype(np.float32)))

    def prepare_input(self, idx: int) -> Dict:
        return dict(
            img_info=self.data_infos[idx],
            ann_info=self.get_ann_info(idx),
            img_prefix=self.img_prefix,
            dataset=self,
            _idx=idx)

    def __getitem__(self, idx: int) -> Dict:
        if self.test_mode:
            return self.pipeline(self.prepare_input(idx))
        for _ in range(20):
            data = self.pipeline(self.prepare_input(idx))
            if data is not None and len(data.get('gt_bboxes', ())) > 0:
                return data
            idx = random.randint(0, len(self) - 1)
        return data


@DATASETS.register_module()
class TrafficSignDataset(CustomDataset):
    """Tencent traffic-sign dataset (fork: tencent_traffic.py:11).

    Annotations are per-image ``.circle`` text files: each line
    ``x1,y1,x2,y2[,difficulty]``; with no .circle files present the image
    folder itself yields pseudo (empty) annotations for test submission.
    """
    CLASSES = ('sign',)

    def __init__(self, *args, difficulty_thresh: int = 100, **kwargs):
        self.difficulty_thresh = difficulty_thresh
        super().__init__(*args, **kwargs)

    def load_annotations(self, ann_folder: str) -> List[Dict]:
        data_infos = []
        ann_files = sorted(glob.glob(ann_folder + '/*.circle'))
        if not ann_files:  # test phase: pseudo annotations from images
            for img in sorted(glob.glob(ann_folder + '/*.jpg')):
                data_infos.append(
                    dict(filename=osp.basename(img), width=0, height=0,
                         ann=dict(bboxes=np.zeros((0, 4), np.float32),
                                  labels=np.array([], np.int64))))
            return data_infos
        for ann_file in ann_files:
            img_id = osp.basename(ann_file)[:-7]
            bboxes, labels = [], []
            with open(ann_file) as f:
                for line in f:
                    parts = [float(v) for v in line.strip().split(',') if v]
                    if len(parts) < 4:
                        continue
                    if len(parts) > 4 and parts[4] > self.difficulty_thresh:
                        continue
                    bboxes.append(parts[:4])
                    labels.append(0)
            data_infos.append(
                dict(filename=img_id + '.jpg', width=0, height=0,
                     ann=dict(
                         bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                         labels=np.asarray(labels, np.int64))))
        return data_infos


@DATASETS.register_module()
class GarbageDataset(CustomDataset):
    """Fork's garbage-detection dataset (garbage.py): json annotation list
    in the CustomDataset format."""
    CLASSES = tuple(f'class{i}' for i in range(44))


@DATASETS.register_module()
class XMLDataset(CustomDataset):
    """VOC-style XML dataset (reference xml_style.py): ``ann_file`` lists
    image ids; annotations live in ``Annotations/<id>.xml``."""
    CLASSES = ()

    def __init__(self, *args, min_size: Optional[int] = None, **kwargs):
        self.min_size = min_size
        super().__init__(*args, **kwargs)

    def load_annotations(self, ann_file: str) -> List[Dict]:
        import xml.etree.ElementTree as ET
        with open(ann_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        root_dir = osp.dirname(osp.dirname(ann_file))
        data_infos = []
        for img_id in ids:
            xml_path = osp.join(root_dir, '..', 'Annotations',
                                f'{img_id}.xml')
            if not osp.exists(xml_path):
                xml_path = osp.join(osp.dirname(ann_file), '..', '..',
                                    'Annotations', f'{img_id}.xml')
            tree = ET.parse(xml_path)
            root = tree.getroot()
            size = root.find('size')
            w = int(size.find('width').text)
            h = int(size.find('height').text)
            bboxes, labels = [], []
            bboxes_ignore, labels_ignore = [], []
            for obj in root.findall('object'):
                name = obj.find('name').text
                if name not in cat2label:
                    continue
                diff = obj.find('difficult')
                difficult = int(diff.text) if diff is not None else 0
                b = obj.find('bndbox')
                box = [float(b.find(t).text)
                       for t in ('xmin', 'ymin', 'xmax', 'ymax')]
                ignore = bool(difficult)
                if self.min_size:
                    if (box[2] - box[0] < self.min_size
                            or box[3] - box[1] < self.min_size):
                        ignore = True
                if ignore:
                    # difficult/undersized objects go to the ignore set
                    # (reference xml_style.py:86-104)
                    bboxes_ignore.append(box)
                    labels_ignore.append(cat2label[name])
                else:
                    bboxes.append(box)
                    labels.append(cat2label[name])
            data_infos.append(
                dict(filename=f'JPEGImages/{img_id}.jpg', width=w, height=h,
                     ann=dict(
                         bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                         labels=np.asarray(labels, np.int64),
                         bboxes_ignore=np.asarray(
                             bboxes_ignore, np.float32).reshape(-1, 4),
                         labels_ignore=np.asarray(labels_ignore,
                                                  np.int64))))
        return data_infos

    def evaluate(self, results, metric='mAP', iou_thr=0.5,
                 proposal_nums=(100, 300, 1000), year='2007',
                 scale_ranges=None):
        """VOC-protocol evaluation (reference voc.py:32-91).

        Args:
            results: per-image per-class det lists.
            metric: 'mAP' or 'recall'.
        """
        from ..evaluation.recall import eval_recalls
        from ..evaluation.voc_map import eval_map
        annotations = [
            {**self.data_infos[i]['ann']} for i in range(len(self))
        ]
        if metric == 'mAP':
            ds_name = 'voc07' if str(year) == '2007' else self.CLASSES
            mean_ap, _ = eval_map(results, annotations,
                                  scale_ranges=scale_ranges,
                                  iou_thr=iou_thr, dataset=ds_name)
            return {'mAP': float(mean_ap)}
        if metric == 'recall':
            gts = [ann['bboxes'] for ann in annotations]
            proposals = []
            for r in results:
                if isinstance(r, list):
                    r = np.vstack([x for x in r if len(x)]) if any(
                        len(x) for x in r) else np.zeros((0, 5), np.float32)
                proposals.append(np.asarray(r))
            recalls = eval_recalls(gts, proposals, list(proposal_nums),
                                   [iou_thr] if np.isscalar(iou_thr)
                                   else list(iou_thr))
            out = {}
            for i, n in enumerate(proposal_nums):
                out[f'recall@{n}'] = float(recalls[i].mean())
            return out
        raise KeyError(f'metric {metric} is not supported')


@DATASETS.register_module()
class VOCDataset(XMLDataset):
    CLASSES = ('aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus',
               'car', 'cat', 'chair', 'cow', 'diningtable', 'dog', 'horse',
               'motorbike', 'person', 'pottedplant', 'sheep', 'sofa',
               'train', 'tvmonitor')


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation wrapper (reference dataset_wrappers.py:14)."""

    def __init__(self, datasets: List):
        from .dataset import build_dataset
        self.datasets = [
            d if not isinstance(d, dict) else build_dataset(d)
            for d in datasets
        ]
        self.CLASSES = self.datasets[0].CLASSES
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets])
        self.flag = np.concatenate([d.flag for d in self.datasets])
        self._group_indices = {
            g: np.where(self.flag == g)[0]
            for g in np.unique(self.flag)
        }

    def __len__(self):
        return int(self.cumulative_sizes[-1])

    def _locate(self, idx):
        ds = int(np.searchsorted(self.cumulative_sizes, idx, side='right'))
        base = 0 if ds == 0 else int(self.cumulative_sizes[ds - 1])
        return ds, idx - base

    def __getitem__(self, idx):
        ds, local = self._locate(idx)
        return self.datasets[ds][local]

    def batch_rand_others(self, idx, batch):
        ds, local = self._locate(idx)
        base = 0 if ds == 0 else int(self.cumulative_sizes[ds - 1])
        return [base + i
                for i in self.datasets[ds].batch_rand_others(local, batch)]

    def get_ann_info_test(self, idx):
        ds, local = self._locate(idx)
        return self.datasets[ds].get_ann_info_test(local)


@DATASETS.register_module()
class RepeatDataset:
    """Repeat wrapper for epoch-length control
    (reference dataset_wrappers.py:128)."""

    def __init__(self, dataset, times: int):
        from .dataset import build_dataset
        self.dataset = (dataset if not isinstance(dataset, dict)
                        else build_dataset(dataset))
        self.times = times
        self.CLASSES = self.dataset.CLASSES
        self._ori_len = len(self.dataset)
        self.flag = np.tile(self.dataset.flag, times)
        self._group_indices = {
            g: np.where(self.flag == g)[0]
            for g in np.unique(self.flag)
        }

    def __len__(self):
        return self.times * self._ori_len

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def batch_rand_others(self, idx, batch):
        return self.dataset.batch_rand_others(idx % self._ori_len, batch)

    def get_ann_info_test(self, idx):
        return self.dataset.get_ann_info_test(idx % self._ori_len)


@DATASETS.register_module()
class ClassBalancedDataset:
    """Class-frequency oversampling wrapper
    (reference dataset_wrappers.py:172, LVIS-style repeat factors
    ``max(1, sqrt(t / f(c)))``)."""

    def __init__(self, dataset, oversample_thr: float):
        from .dataset import build_dataset
        self.dataset = (dataset if not isinstance(dataset, dict)
                        else build_dataset(dataset))
        self.oversample_thr = oversample_thr
        self.CLASSES = self.dataset.CLASSES

        repeat_factors = self._get_repeat_factors(self.dataset,
                                                  oversample_thr)
        repeat_indices = []
        for idx, rf in enumerate(repeat_factors):
            repeat_indices.extend([idx] * int(math.ceil(rf)))
        self.repeat_indices = repeat_indices
        self.flag = self.dataset.flag[repeat_indices]
        self._group_indices = {
            g: np.where(self.flag == g)[0]
            for g in np.unique(self.flag)
        }

    def _get_repeat_factors(self, dataset, thr):
        category_freq: Dict[int, float] = defaultdict(float)
        num_images = len(dataset)
        img_cats = []
        for idx in range(num_images):
            cats = set(dataset.get_ann_info(idx)['labels'].tolist())
            img_cats.append(cats)
            for c in cats:
                category_freq[c] += 1
        for k in category_freq:
            category_freq[k] /= num_images
        cat_repeat = {
            c: max(1.0, math.sqrt(thr / f))
            for c, f in category_freq.items()
        }
        return [
            max({cat_repeat[c] for c in cats}, default=1.0)
            for cats in img_cats
        ]

    def __len__(self):
        return len(self.repeat_indices)

    def __getitem__(self, idx):
        return self.dataset[self.repeat_indices[idx]]

    def batch_rand_others(self, idx, batch):
        return [
            self.repeat_indices[i] for i in
            np.random.choice(len(self.repeat_indices), batch)
        ]

    def get_ann_info_test(self, idx):
        return self.dataset.get_ann_info_test(self.repeat_indices[idx])
