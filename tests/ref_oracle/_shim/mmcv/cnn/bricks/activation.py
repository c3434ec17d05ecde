from . import build_activation_layer  # noqa: F401
from .registry import ACTIVATION_LAYERS  # noqa: F401
