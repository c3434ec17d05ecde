#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Stage-by-stage timing of the flagship model on the current device."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from __graft_entry__ import _flagship_model

    batch = int(_os.environ.get('BENCH_BATCH', 32))
    dtype = jnp.bfloat16
    model = _flagship_model(dtype=dtype)
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 640, 640, 3),
                      dtype)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])

    backbone = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: m.backbone(xx)))
    bb_neck = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, xx: m.extract_feat(xx)))
    full_net = jax.jit(model.apply)
    decode_only = jax.jit(lambda v, x: model.get_bboxes(
        model.apply(v, x), with_nms=False))
    e2e = jax.jit(lambda v, x: model.get_bboxes(model.apply(v, x)))

    res = {}
    res['backbone_ms'] = round(timed(backbone, variables, img), 2)
    res['backbone+neck_ms'] = round(timed(bb_neck, variables, img), 2)
    res['full_net_ms'] = round(timed(full_net, variables, img), 2)
    res['net+decode_ms'] = round(timed(decode_only, variables, img), 2)
    res['e2e_ms'] = round(timed(e2e, variables, img), 2)
    res['batch'] = batch
    res['img_per_s_e2e'] = round(batch / res['e2e_ms'] * 1e3, 1)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
