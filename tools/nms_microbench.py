#!/usr/bin/env python
"""Microbenchmark: scan vs fixed-point NMS on the current accelerator."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.core.nms import nms_padded, nms_padded_scan


def bench(fn, boxes, scores, iters=10):
    out = fn(boxes, scores)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(boxes, scores)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    b, k = 32, 2048
    rng = np.random.RandomState(0)
    xy = rng.rand(b, k, 2).astype(np.float32) * 600
    wh = rng.rand(b, k, 2).astype(np.float32) * 80 + 4
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.rand(b, k).astype(np.float32))

    fp = jax.jit(jax.vmap(lambda bx, s: nms_padded(bx, s, 0.65, 300)))
    sc = jax.jit(jax.vmap(lambda bx, s: nms_padded_scan(bx, s, 0.65, 300)))

    t_fp = bench(fp, boxes, scores)
    t_sc = bench(sc, boxes, scores)
    # agreement check
    i1, v1 = fp(boxes, scores)
    i2, v2 = sc(boxes, scores)
    agree = all(
        np.array_equal(np.asarray(i1[i])[np.asarray(v1[i])],
                       np.asarray(i2[i])[np.asarray(v2[i])])
        for i in range(b))
    print(json.dumps(dict(
        batch=b, k=k,
        fixedpoint_ms=round(t_fp * 1e3, 2),
        scan_ms=round(t_sc * 1e3, 2),
        speedup=round(t_sc / t_fp, 2),
        agree=agree)))


if __name__ == '__main__':
    main()
