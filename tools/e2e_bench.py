#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""North-star e2e benchmark: JPEG bytes -> letterbox -> network -> decode
-> NMS, images/sec (BASELINE.json metric).

Host side (decode + letterbox, threaded) is pipelined against the device:
the host prepares batch k+1 while the device runs batch k. Reports both
the combined e2e rate and the isolated host/device rates so the binding
stage is visible. Synthetic JPEGs are generated in-memory at a realistic
resolution.
"""
import argparse
import json
import threading
import time
from queue import Queue

import cv2
import numpy as np


def _maybe_reexec_with_remote_compile():
    """Same as bench.py: XLA:TPU compiles of this model take 10+ minutes
    on this 1-core host but seconds via the terminal-side compile service;
    the flag is read at interpreter start, so re-exec once with it set."""
    import os
    import sys
    if os.environ.get('PALLAS_AXON_REMOTE_COMPILE') != '1' and \
            os.environ.get('TPUDET_NO_REEXEC') != '1':
        os.environ['PALLAS_AXON_REMOTE_COMPILE'] = '1'
        os.environ['TPUDET_NO_REEXEC'] = '1'
        os.execve(sys.executable, [sys.executable] + sys.argv, os.environ)


def make_jpegs(n, h=480, w=640, quality=90, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # smooth it so jpeg size is realistic
        img = cv2.GaussianBlur(img, (7, 7), 3)
        ok, buf = cv2.imencode('.jpg', img,
                               [cv2.IMWRITE_JPEG_QUALITY, quality])
        assert ok
        out.append(buf.tobytes())
    return out


def decode_letterbox(jpeg: bytes, size: int):
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    h, w = img.shape[:2]
    f = min(size / h, size / w)
    nw, nh = int(w * f + 0.5), int(h * f + 0.5)
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((size, size, 3), np.uint8)
    canvas[:nh, :nw] = img
    return canvas, np.array([nw / w, nh / h, nw / w, nh / h], np.float32)


def make_host_loader(loader: str, size: int):
    """Batch jpeg->letterbox fn: list[bytes] -> (imgs[n,s,s,3], sf[n,4]).

    'native' = the fused C++ loader (tpudet/ops/native/jpeg_loader.cc,
    internal thread pool, GIL-free — the production host path); 'cv2' =
    the Python loop. Outputs are bit-identical (parity test:
    tests/test_data/test_jpeg_native.py).
    """
    if loader == 'native':
        from tpudet.ops.native import jpeg_native
        if jpeg_native.available():
            def run(jpegs):
                out, sf, status = jpeg_native.decode_letterbox_batch(
                    jpegs, size, size, pad_val=0, bgr=True)
                assert (status == 0).all()
                return out, sf
            return run, 'native'
        loader = 'cv2'  # fall through

    def run(jpegs):
        items = [decode_letterbox(j, size) for j in jpegs]
        return (np.stack([x[0] for x in items]),
                np.stack([x[1] for x in items]))
    return run, 'cv2'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--scale', default='l')
    p.add_argument('--out', default=None,
                   help='also write the artifact json here '
                        '(e.g. docs/e2e_bench.json)')
    p.add_argument('--loader', default='native', choices=['native', 'cv2'],
                   help='host jpeg->letterbox stage: fused C++ loader '
                        '(default) or the Python cv2 loop')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from tpudet.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    model = _flagship_model(dtype=jnp.bfloat16, scale=args.scale)
    b, s = args.batch, args.img_size
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, s, s, 3), jnp.bfloat16))

    @jax.jit
    def infer(raw_u8, scale_factor):
        # normalize on device (mean 114 / std 255, BGR->RGB) — uint8 in
        img = (raw_u8[..., ::-1].astype(jnp.bfloat16) - 114.0) / 255.0
        pred_maps = model.apply(variables, img)
        res = model.get_bboxes(pred_maps, scale_factors=scale_factor)
        return res

    jpegs = make_jpegs(b * 2)
    host_load, loader_used = make_host_loader(args.loader, s)

    # host-only rate
    host_load(jpegs[:b])  # warm (builds the .so on first use)
    t0 = time.perf_counter()
    host_batches = 4
    for i in range(host_batches):
        batch = host_load([jpegs[(i + j) % len(jpegs)] for j in range(b)])
    host_dt = (time.perf_counter() - t0) / host_batches
    host_rate = b / host_dt

    # warm device
    raw, sf = batch
    res = infer(raw, sf)
    float(jnp.sum(res.scores))

    # device-only rate (decode->NMS on-device, input resident): two-point
    # timing cancels dispatch constants; the second point reuses the
    # device output so the chain can't overlap across iterations
    draw, dsf = jnp.asarray(raw), jnp.asarray(sf)

    def device_run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = infer(draw, dsf)
        float(jnp.sum(r.scores))
        return time.perf_counter() - t0

    device_run(1)
    d1 = device_run(4)
    d2 = device_run(8)
    device_rate = b * 4 / max(d2 - d1, 1e-9)

    # pipelined e2e: host thread feeds a queue, device consumes
    q: Queue = Queue(maxsize=2)

    def producer():
        for i in range(args.iters):
            q.put(host_load([jpegs[(i * b + j) % len(jpegs)]
                             for j in range(b)]))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    t.start()
    last = None
    while True:
        item = q.get()
        if item is None:
            break
        last = infer(item[0], item[1])
    float(jnp.sum(last.scores))  # fetch: sync
    e2e_dt = time.perf_counter() - t0
    e2e_rate = b * args.iters / e2e_dt

    import multiprocessing
    n_cores = multiprocessing.cpu_count()
    # production TPU hosts carry >100 cores (the reference budgets 6 CPU
    # workers per GPU); host decode scales linearly with cores, so the
    # projected jpeg->NMS rate on a real host is min(host*cores, device)
    projected = min(host_rate * 100, device_rate)
    artifact = dict(
        metric=f'yolov4{args.scale}-{s} jpeg->NMS e2e (BASELINE.json '
               'north-star metric)',
        e2e_img_per_s=round(e2e_rate, 1),
        host_decode_img_per_s=round(host_rate, 1),
        device_img_per_s=round(device_rate, 1),
        host_cores=n_cores,
        host_loader=loader_used,
        projected_img_per_s_100core_host=round(projected, 1),
        batch=b, iters=args.iters,
        note='this env: host decode single-core AND host->device link '
             '~42 MB/s over a network tunnel — both environment '
             'artifacts, not framework costs; measured e2e here is '
             'min(host_decode, link, device); roofline on a real TPU '
             'host (>100 cores, PCIe) is min(host_decode*cores, device)')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == '__main__':
    _maybe_reexec_with_remote_compile()
    main()
