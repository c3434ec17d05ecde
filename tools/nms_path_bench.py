"""Compare e2e (fwd+decode+NMS) throughput of the NMS path variants on the
flagship yolov4l-640: flat-capped (nms_pre), exact dense per-class
(nms_pre=-1), and per-class-budget (class_pre). Drives the same chained
timing protocol as bench.py; prints one JSON line per variant.

Usage: python tools/nms_path_bench.py [--batch 128] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_reexec_with_remote_compile():
    if os.environ.get('PALLAS_AXON_REMOTE_COMPILE') != '1' and \
            os.environ.get('TPUDET_NO_REEXEC') != '1':
        os.environ['PALLAS_AXON_REMOTE_COMPILE'] = '1'
        os.environ['TPUDET_NO_REEXEC'] = '1'
        os.execve(sys.executable, [sys.executable] + sys.argv, os.environ)


VARIANTS = [
    ('flat nms_pre=8192', dict(nms_pre=8192, class_pre=0)),
    ('flat nms_pre=1024', dict(nms_pre=1024, class_pre=0)),
    ('dense exact nms_pre=-1', dict(nms_pre=0, class_pre=0)),
    ('class_pre=256', dict(nms_pre=0, class_pre=256)),
    ('class_pre=300', dict(nms_pre=0, class_pre=300)),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--variant', default=None,
                        help='substring filter on variant names')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from tpudet.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    model = _flagship_model(dtype=jnp.bfloat16)
    img = jnp.asarray(
        np.random.RandomState(0).rand(args.batch, 640, 640, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])

    for name, overrides in VARIANTS:
        if args.variant and args.variant not in name:
            continue

        @jax.jit
        def infer_chained(image, _ov=dict(overrides)):
            pred_maps = model.apply(variables, image)
            res = model.get_bboxes(pred_maps, **_ov)
            s = jnp.sum(res.bboxes).astype(image.dtype) * 1e-12
            return image + s, res

        x, res = infer_chained(img)
        float(jnp.sum(res.scores))

        def run(n, x):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                x, out = infer_chained(x)
            float(jnp.sum(out.scores))
            return time.perf_counter() - t0, x

        m = args.iters
        t1, x = run(m, x)
        t2, x = run(2 * m, x)
        dt = max(t2 - t1, 1e-9)
        print(json.dumps({
            'variant': name,
            'img_per_sec': round(args.batch * m / dt, 2),
            'batch': args.batch,
        }), flush=True)


if __name__ == '__main__':
    _maybe_reexec_with_remote_compile()
    main()
