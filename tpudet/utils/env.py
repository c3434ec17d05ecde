"""Environment fingerprint (reference mmdet/utils/collect_env.py analogue),
recorded into training meta for reproducibility."""
from __future__ import annotations

import platform
import sys
from collections import OrderedDict


def collect_env() -> 'OrderedDict[str, str]':
    env = OrderedDict()
    env['sys.platform'] = sys.platform
    env['Python'] = sys.version.replace('\n', '')
    env['platform'] = platform.platform()
    try:
        import jax
        env['JAX'] = jax.__version__
        env['jaxlib'] = jax.lib.__version__ if hasattr(jax, 'lib') else '?'
        env['backend'] = jax.default_backend()
        env['devices'] = ', '.join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        env['JAX'] = f'unavailable ({e})'
    for mod in ('flax', 'optax', 'numpy', 'cv2'):
        try:
            m = __import__(mod)
            env[mod] = getattr(m, '__version__', '?')
        except ImportError:
            env[mod] = 'not installed'
    try:
        import tpudet
        env['tpudet'] = tpudet.__version__
    except Exception:
        pass
    return env


def collect_env_str() -> str:
    return '\n'.join(f'{k}: {v}' for k, v in collect_env().items())
