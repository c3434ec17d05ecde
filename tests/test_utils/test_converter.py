"""Torch->JAX converter round-trip: the name mapping must cover the whole
flax tree (both directions) and invert conv transposition exactly."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tools.model_converters.torch_to_jax import build_mapping, convert  # noqa: E402
from tpudet.models.builder import build_detector  # noqa: E402


def flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flat(v, prefix + (k,)))
        else:
            out['/'.join(prefix + (k,))] = np.asarray(v)
    return out


def test_yolov4s_mapping_roundtrip():
    cfg = dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                  out_channels=[128, 256, 512], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=80,
                       in_channels=[128, 256, 512]))
    model = build_detector(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    params_flat = flat(variables['params'])
    stats_flat = flat(variables['batch_stats'])

    mapping = build_mapping('yolov4', 'v4s5p', 3, csp_repetition=1)
    dst_names = {dst for dst, kind in mapping.values()}

    # every flax leaf must be covered by the mapping
    missing_params = set(params_flat) - dst_names
    missing_stats = set(stats_flat) - dst_names
    assert not missing_params, sorted(missing_params)[:8]
    assert not missing_stats, sorted(missing_stats)[:8]

    # synthesize a torch-style state dict from the flax tree via the
    # inverse mapping, convert it back, and compare exactly
    inverse = {dst: (src, kind) for src, (dst, kind) in mapping.items()}
    rng = np.random.RandomState(0)
    torch_sd = {}
    ref_tree = {}
    for name, arr in {**params_flat, **stats_flat}.items():
        src, kind = inverse[name]
        val = rng.randn(*arr.shape).astype(np.float32)
        ref_tree[name] = val
        torch_sd[src] = (val.transpose(3, 2, 0, 1)
                         if kind == 'conv' else val)

    out = convert(torch_sd, mapping)
    assert not out['missing']
    assert not out['unused']
    got = {**flat(out['params']), **flat(out['batch_stats'])}
    assert set(got) == set(ref_tree)
    for name in ref_tree:
        np.testing.assert_array_equal(got[name], ref_tree[name], err_msg=name)


def test_yolov5s_mapping_covers_tree():
    cfg = dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v5s5p', out_indices=[2, 3, 4]),
        neck=dict(type='YOLOV5Neck', in_channels=[128, 256, 512],
                  out_channels=[128, 256, 512], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=80,
                       in_channels=[128, 256, 512]))
    model = build_detector(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    mapping = build_mapping('yolov5', 'v5s5p', 3, csp_repetition=1)
    dst_names = {dst for dst, kind in mapping.values()}
    missing = set(flat(variables['params'])) - dst_names
    missing |= set(flat(variables['batch_stats'])) - dst_names
    assert not missing, sorted(missing)[:8]
