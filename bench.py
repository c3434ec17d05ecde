"""Benchmark: YOLOv4-l 640x640 end-to-end inference (forward -> decode ->
class-aware NMS) images/sec/chip on the available accelerator.

Protocol mirrors the reference's tools/analysis_tools/benchmark.py (pure
network + post-processing, excludes data loading; SURVEY.md §6) on padded
batches. Prints ONE JSON line.

``vs_baseline`` is measured against the closest published reference-stack
number: YOLOv4-paper 608-input V100 throughput ~65 img/s (BASELINE.md,
arXiv 2004.10934) — the reference repo publishes no YOLOv4 numbers itself.
"""
import json
import time

import numpy as np

BASELINE_V100_FPS = 65.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    batch = 32
    model = _flagship_model(dtype=jnp.bfloat16)
    img = jnp.asarray(
        np.random.RandomState(0).rand(batch, 640, 640, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])

    @jax.jit
    def infer(image):
        pred_maps = model.apply(variables, image)
        res = model.get_bboxes(pred_maps)
        return res.bboxes, res.scores, res.labels, res.valid

    # warmup + compile
    jax.block_until_ready(infer(img))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_iters / dt
    print(json.dumps({
        'metric': 'yolov4l-640 e2e inference (fwd+decode+NMS)',
        'value': round(imgs_per_sec, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(imgs_per_sec / BASELINE_V100_FPS, 3),
    }))


if __name__ == '__main__':
    main()
