from .coco_api import COCO
from .dataset import CocoDataset, build_dataset
from .loader import DetDataLoader
from . import pipelines  # noqa: F401  (registers transforms)

__all__ = ['COCO', 'CocoDataset', 'build_dataset', 'DetDataLoader']
