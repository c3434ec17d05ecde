#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Stage-by-stage timing of the flagship model on the current device.

Uses the same data-dependency chaining protocol as bench.py: a scalar
from each iteration's output folds into the next input, so overlapping
dispatches on the remote PJRT backend cannot hide execution time, and
the 2N-N subtraction removes the fixed dispatch overhead."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_chained(fn, img, iters=10):
    """fn(image) -> pytree. Returns ms/iter measured via (2N - N)."""

    @jax.jit
    def chained(image):
        out = fn(image)
        leaf = jax.tree.leaves(out)[0]
        s = (jnp.sum(leaf) * 1e-12).astype(image.dtype)
        return image + s, out

    x, out = chained(img)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    def run(n, x):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            x, o = chained(x)
        float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
        return time.perf_counter() - t0, x

    t1, x = run(iters, x)
    t2, x = run(2 * iters, x)
    return max(t2 - t1, 1e-9) / iters * 1e3


def main():
    from __graft_entry__ import _flagship_model
    try:
        from tpudet.utils.jax_cache import enable_persistent_cache
        enable_persistent_cache()
    except Exception:
        pass

    batch = int(_os.environ.get('BENCH_BATCH', 32))
    dtype = jnp.bfloat16
    model = _flagship_model(dtype=dtype)
    nms_pre = int(_os.environ.get('BENCH_NMS_PRE', 0))
    if nms_pre:
        import dataclasses
        cfg = dict(model.test_cfg)
        cfg['nms_pre'] = nms_pre
        cfg['anchor_pre'] = nms_pre
        model = dataclasses.replace(model, test_cfg=cfg)
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 640, 640, 3),
                      dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])

    stages = {
        'backbone_ms': lambda x: model.apply(
            variables, x, method=lambda m, xx: m.backbone(xx)),
        'backbone+neck_ms': lambda x: model.apply(
            variables, x, method=lambda m, xx: m.extract_feat(xx)),
        'full_net_ms': lambda x: model.apply(variables, x),
        'net+decode_ms': lambda x: model.get_bboxes(
            model.apply(variables, x), with_nms=False),
        'e2e_ms': lambda x: model.get_bboxes(model.apply(variables, x)),
    }
    res = {}
    for name, fn in stages.items():
        res[name] = round(timed_chained(fn, img), 2)
    res['batch'] = batch
    res['img_per_s_e2e'] = round(batch / res['e2e_ms'] * 1e3, 1)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
