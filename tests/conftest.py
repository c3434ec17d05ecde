"""Test configuration: force an 8-device virtual CPU mesh.

The reference fakes distribution with mocks (SURVEY.md §4); here multi-chip
code paths run for real on 8 virtual CPU devices.

A persistent compilation cache keeps repeat test runs fast on this 1-core
host (first run pays XLA compiles; reruns hit the cache).
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')

# This image's sitecustomize force-registers a remote TPU PJRT plugin
# ('axon') and overrides jax_platforms, which would silently route every
# test op over the network tunnel. Pin the platform back to host CPU.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# the env-var spelling of the cache options is ignored in this jax build;
# set them programmatically so repeat test runs skip XLA compiles
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax-cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def pytest_collection_modifyitems(config, items):
    """Auto-mark the long-running categories `slow` so `-m "not slow"`
    gives a fast (<~15 min on this 1-core host) signal; the full suite
    (incl. the live-reference oracle tests) stays the complete gate."""
    import pytest
    slow_fragments = (
        '/ref_oracle/',            # imports + runs the torch reference
        'test_config_forward',     # builds + forwards every config family
        'test_overfit',            # multi-step training runs
        'test_segm_e2e',           # Mask R-CNN end-to-end
        'test_plugin_families',    # builds several full detectors
        'test_sharded_eval',       # 8-device eval loops
        'test_train_api',          # train_detector end-to-end runs
        'test_pisa_ld',            # full detector losses
    )
    for item in items:
        p = str(item.fspath)
        if any(f in p for f in slow_fragments):
            item.add_marker(pytest.mark.slow)
