from . import build_norm_layer, is_norm  # noqa: F401
from .registry import NORM_LAYERS  # noqa: F401
