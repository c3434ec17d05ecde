"""Root logger (reference mmdet/utils/logger.py analogue)."""
from __future__ import annotations

import logging

_initialized = set()


def get_root_logger(log_file=None, log_level=logging.INFO,
                    name='tpudet') -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file, 'a')
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(log_level)
    logger.propagate = False
    _initialized.add(name)
    return logger
