from .logging import get_root_logger
from .checkpoint import save_variables, load_variables

__all__ = ['get_root_logger', 'save_variables', 'load_variables']
