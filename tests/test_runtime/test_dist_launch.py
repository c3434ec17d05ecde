"""REAL multi-process launch through the shipped CLI flags.

Reference analogue: ``init_dist(launcher, backend='nccl')``
(/root/reference/tools/train.py:116-120) spawning one process per GPU
via torch.distributed.launch / tools/dist_train.sh. Here two actual OS
processes run the literal ``tools/train.py`` with
``--coordinator/--num-processes/--process-id`` (the flags
tools/dist_train.sh passes), each backed by one virtual CPU device, so
``jax.distributed.initialize`` + the gloo CPU collectives + the
process-sharded loader + the global-mesh SPMD train step all execute
for real — no mocks, no simulation (the loader-level simulation lives in
test_multihost_train.py).

Asserts, from the per-process logs and filesystem:
- both processes see the 2-device global mesh (``devices 2 global /
  1 local, process i/2``);
- both run the same number of steps with finite losses;
- the final param checksums are IDENTICAL across processes — a process
  that silently fell back to single-process training would train on its
  own loader shard only and diverge;
- only process 0 writes checkpoints (``latest_ema.msgpack``).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_dataset(root):
    import cv2
    rng = np.random.RandomState(0)
    img_dir = root / 'images'
    img_dir.mkdir(parents=True)
    imgs, anns, aid = [], [], 1
    for i in range(8):
        img = (rng.rand(128, 128, 3) * 255).astype('uint8')
        for _ in range(2):
            x, y = rng.randint(5, 60, 2)
            w, h = rng.randint(20, 50, 2)
            cv2.rectangle(img, (x, y), (x + w, y + h), (0, 255, 0), -1)
            anns.append(dict(id=aid, image_id=i + 1, category_id=1,
                             bbox=[int(x), int(y), int(w), int(h)],
                             area=int(w * h), iscrowd=0))
            aid += 1
        cv2.imwrite(str(img_dir / f'{i:04d}.jpg'), img)
        imgs.append(dict(id=i + 1, file_name=f'{i:04d}.jpg',
                         width=128, height=128))
    ann = root / 'ann.json'
    ann.write_text(json.dumps(dict(
        images=imgs, annotations=anns,
        categories=[dict(id=1, name='thing')])))
    return ann, img_dir


def _write_config(path, ann, img_dir):
    norm = "dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)"
    path.write_text(f"""
_base_ = '{REPO}/configs/yolov4/yolov4s_coco_mosaic.py'
model = dict(backbone=dict(scale='v4s5p'), bbox_head=dict(num_classes=1))
img_norm_cfg = {norm}
train_pipeline = [
    dict(type='MosaicPipeline',
         individual_pipeline=[
             dict(type='LoadImageFromFile'),
             dict(type='LoadAnnotations', with_bbox=True),
             dict(type='Resize', img_scale=(128, 128), keep_ratio=True),
         ],
         pad_val=114),
    dict(type='RandomAffineChain', pad_to=384, crop=256, scale_limit=0.5,
         out=128, hflip_p=0.5, pad_val=114, min_area=4,
         min_visibility=0.2),
    dict(type='GtBBoxesFilter', min_size=2, max_aspect_ratio=20),
    dict(type='Normalize', **img_norm_cfg),
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=0, train_img_size=128, max_gts=8,
    train=dict(ann_file='{ann}', img_prefix='{img_dir}/',
               classes=('thing',), pipeline=train_pipeline))
log_config = dict(interval=1)
evaluation = dict(interval=10000)
nominal_batch_size = 4
seed = 0
""")


def test_two_process_cli_launch(tmp_path):
    ann, img_dir = _make_dataset(tmp_path / 'data')
    cfg = tmp_path / 'cfg.py'
    _write_config(cfg, ann, img_dir)
    port = _free_port()

    def env_for():
        env = dict(os.environ)
        # TPUDET_PLATFORM pins the backend at config level inside
        # init_distributed (a bare JAX_PLATFORMS is overridden by this
        # image's interpreter-start hook); one virtual device per
        # process -> 2-device global mesh
        env['TPUDET_PLATFORM'] = 'cpu'
        env['JAX_PLATFORMS'] = 'cpu'
        flags = env.get('XLA_FLAGS', '')
        flags = ' '.join(f for f in flags.split()
                         if 'host_platform_device_count' not in f)
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=1').strip()
        env.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax-cpu')
        return env

    procs = []
    for pid in range(2):
        wd = tmp_path / f'work{pid}'
        cmd = [sys.executable, os.path.join(REPO, 'tools', 'train.py'),
               str(cfg), '--work-dir', str(wd), '--max-steps', '4',
               '--no-resume', '--coordinator', f'localhost:{port}',
               '--num-processes', '2', '--process-id', str(pid)]
        procs.append((wd, subprocess.Popen(
            cmd, env=env_for(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)))

    outs = []
    for wd, proc in procs:
        out, _ = proc.communicate(timeout=1200)
        outs.append((wd, proc.returncode, out.decode(errors='replace')))
    for wd, rc, out in outs:
        assert rc == 0, f'{wd} failed:\n{out[-4000:]}'

    checksums, steps = [], []
    for pid, (wd, _, out) in enumerate(outs):
        log = (wd / 'train.log').read_text()
        assert f'devices 2 global / 1 local, process {pid}/2' in log, (
            f'process {pid} did not join the 2-process mesh:\n'
            f'{log[-2000:]}')
        loss_lines = [ln for ln in log.splitlines() if ' loss ' in ln]
        assert loss_lines, log[-2000:]
        assert 'nan' not in loss_lines[-1].lower()
        steps.append(len(loss_lines))
        cks = [ln for ln in log.splitlines()
               if 'final param checksum' in ln]
        assert cks, f'process {pid} logged no checksum:\n{log[-2000:]}'
        checksums.append(cks[-1].split('checksum')[1].strip())

    assert steps[0] == steps[1]
    assert checksums[0] == checksums[1], (
        f'cross-process param divergence: {checksums}')

    # host-0-only checkpointing (reference: rank-0 CheckpointHook)
    assert (outs[0][0] / 'latest_ema.msgpack').exists()
    assert not (outs[1][0] / 'latest_ema.msgpack').exists()
