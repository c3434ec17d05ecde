from .coco_api import COCO
from .dataset import CocoDataset, build_dataset
from .loader import DetDataLoader
from . import pipelines  # noqa: F401  (registers transforms)
from .custom import (CustomDataset, TrafficSignDataset, GarbageDataset,
                     XMLDataset, VOCDataset, ConcatDataset, RepeatDataset,
                     ClassBalancedDataset)
from .device_aug import device_mosaic_affine

__all__ = [
    'COCO', 'CocoDataset', 'build_dataset', 'DetDataLoader',
    'CustomDataset', 'TrafficSignDataset', 'GarbageDataset', 'XMLDataset',
    'VOCDataset', 'ConcatDataset', 'RepeatDataset', 'ClassBalancedDataset',
    'device_mosaic_affine'
]
