"""tpudet — a TPU-native (JAX/XLA/Pallas/pjit) object detection framework.

Re-implements the capabilities of the mmdet-yolov4 reference (an mmdetection
v2.12 fork with a full YOLOv4/YOLOv5 stack) as a brand-new JAX framework:
NHWC convnets compiled by XLA onto the MXU, shape-static padded
decode/threshold/NMS, dense mask-based target assignment, pjit data
parallelism with compiler-inserted collectives, and a config+registry
extension surface mirroring the reference's public API.
"""

from .version import __version__
from .registry import Registry, build_from_cfg
from .config import Config

__all__ = ['__version__', 'Registry', 'build_from_cfg', 'Config']
