"""Profiling utilities (reference mmdet/utils/profiling.py analogue).

``profile_time`` wraps a block with monotonic timing +
``jax.block_until_ready`` on a result (the CUDA-event analogue);
``trace`` wraps ``jax.profiler`` for XLA-level traces viewable in
TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Print elapsed wall time of the block. Call
    ``jax.block_until_ready`` on device results inside the block for
    accurate device timing."""
    if not enabled:
        yield
        return
    start = time.monotonic()
    try:
        yield
    finally:
        dt = time.monotonic() - start
        print(f'{trace_name} {name} elapsed_time: {dt * 1000:.2f} ms')


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/tpudet_trace'):
    """Capture a jax.profiler trace of the block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
