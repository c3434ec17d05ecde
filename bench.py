"""Benchmark: YOLOv4-l 640x640 end-to-end inference (forward -> decode ->
class-aware NMS) images/sec/chip on the available accelerator.

Protocol mirrors the reference's tools/analysis_tools/benchmark.py (pure
network + post-processing, excludes data loading; SURVEY.md §6) on padded
batches, with one adjustment for this environment: the remote PJRT backend
executes *independent* dispatches concurrently, so naive loop timing
under-measures. Each iteration therefore consumes a value derived from the
previous iteration's output (data-dependency chaining), forcing serial
execution; timing differences two run lengths to cancel constants.

Prints ONE JSON line. ``vs_baseline`` is against the closest published
reference-stack number: YOLOv4-paper 608-input V100 throughput ~65 img/s
(BASELINE.md, arXiv 2004.10934) — the reference repo publishes no YOLOv4
numbers itself. ``vs_a100_baseline`` restates the ratio in the north
star's own currency (BASELINE.json "≥5× A100-PyTorch img/s/chip") using
the demanding derived A100 baseline of docs/a100_baseline.md;
``a100_5x_met`` is that sentence as a boolean.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_V100_FPS = 65.0
# The north star is stated in A100 currency ("≥5× A100-PyTorch
# img/s/chip", BASELINE.json). docs/a100_baseline.md commits the
# derivation: V100 Darknet anchor 65 img/s × 2.5 (fp16 tensor-peak
# ratio, the most DEMANDING of the constructions considered there).
BASELINE_A100_FPS = 162.5


def _maybe_reexec_with_remote_compile():
    """XLA:TPU compiles of this model take 10+ minutes on this 1-core host
    but seconds via the terminal-side compile service. The flag is read by
    sitecustomize at interpreter start, so re-exec once with it set (only
    when run as a script; jax has not been imported yet at this point)."""
    if os.environ.get('PALLAS_AXON_REMOTE_COMPILE') != '1' and \
            os.environ.get('TPUDET_NO_REEXEC') != '1':
        os.environ['PALLAS_AXON_REMOTE_COMPILE'] = '1'
        os.environ['TPUDET_NO_REEXEC'] = '1'
        os.execve(sys.executable, [sys.executable] + sys.argv, os.environ)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from tpudet.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    batch = int(os.environ.get('TPUDET_BENCH_BATCH', '128'))
    model = _flagship_model(dtype=jnp.bfloat16)
    img = jnp.asarray(
        np.random.RandomState(0).rand(batch, 640, 640, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img[:1])

    @jax.jit
    def infer_chained(image):
        pred_maps = model.apply(variables, image)
        res = model.get_bboxes(pred_maps)
        # fold a scalar from the output back into the next input: forces
        # iteration k+1 to wait for iteration k on async/overlapping
        # backends without changing the math measurably
        s = jnp.sum(res.bboxes).astype(image.dtype) * 1e-12
        return image + s, res

    x, res = infer_chained(img)
    float(jnp.sum(res.scores))  # host fetch: the only reliable sync here

    def run(n, x):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            x, out = infer_chained(x)
        # fetch a scalar derived from the LAST output: forces completion of
        # the whole chain (block_until_ready can return early on this
        # remote backend)
        float(jnp.sum(out.scores))
        return time.perf_counter() - t0, x

    m = 10
    t1, x = run(m, x)
    t2, x = run(2 * m, x)
    dt = max(t2 - t1, 1e-9)
    imgs_per_sec = batch * m / dt

    # self-describing artifact: record exactly which NMS budgets / config
    # produced the number so any drift between rounds is attributable
    import hashlib
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'configs/yolov4/yolov4l_coco_mosaic.py')
    from tpudet.config import Config
    shipped = Config.fromfile(cfg_path)
    test_cfg = dict(shipped['model']['test_cfg'])
    cfg_hash = hashlib.sha256(
        json.dumps(test_cfg, sort_keys=True, default=str)
        .encode()).hexdigest()[:12]

    result = {
        'metric': 'yolov4l-640 e2e inference (fwd+decode+NMS)',
        'value': round(imgs_per_sec, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(imgs_per_sec / BASELINE_V100_FPS, 3),
        'vs_a100_baseline': round(imgs_per_sec / BASELINE_A100_FPS, 3),
        'a100_5x_met': bool(imgs_per_sec >= 5 * BASELINE_A100_FPS),
        'batch': batch,
        'anchor_pre': test_cfg.get('anchor_pre'),
        'lane_pre': test_cfg.get('lane_pre'),
        'class_pre': test_cfg.get('class_pre'),
        'config_hash': cfg_hash,
    }

    # regression guard: compare with the last committed round artifact
    # and warn (stderr, so the JSON line stays clean) on a >3% drop
    import glob
    prior = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'BENCH_r*.json')))
    if prior:
        try:
            with open(prior[-1]) as f:
                last = json.load(f).get('parsed', {})
            lv = last.get('value')
            if lv and imgs_per_sec < 0.97 * lv:
                print(f'WARNING: throughput regression: {imgs_per_sec:.1f} '
                      f'img/s vs {lv:.1f} in {os.path.basename(prior[-1])} '
                      f'({100 * (1 - imgs_per_sec / lv):.1f}% drop)',
                      file=sys.stderr)
        except Exception as e:
            print(f'regression check skipped: {e}', file=sys.stderr)

    print(json.dumps(result))


if __name__ == '__main__':
    _maybe_reexec_with_remote_compile()
    main()
