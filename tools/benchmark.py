#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Pure-inference throughput benchmark
(reference tools/analysis_tools/benchmark.py analogue: network forward +
post-processing, data loading excluded, warmup then steady-state timing)."""
import argparse
import json
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['bfloat16', 'float32'])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from tpudet.apis.inference import init_detector
    from tpudet.config import Config

    cfg = Config.fromfile(args.config)
    if args.dtype == 'bfloat16':
        for part in ('backbone', 'neck', 'bbox_head'):
            cfg['model'][part]['dtype'] = jnp.bfloat16
    det = init_detector(cfg, args.checkpoint)

    img = jnp.asarray(
        np.random.RandomState(0).rand(args.batch_size, args.img_size,
                                      args.img_size, 3),
        jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32)
    scale = np.ones((args.batch_size, 4), np.float32)

    out = det(img, scale)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = det(img, scale)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.batch_size * args.iters / dt
    print(json.dumps(dict(img_per_sec=round(fps, 2),
                          batch=args.batch_size, img_size=args.img_size,
                          dtype=args.dtype)))


if __name__ == '__main__':
    main()
