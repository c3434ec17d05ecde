"""Config-driven forward smoke for every config FAMILY (reference
tests/test_models/test_forward.py:34-92 builds each family from its config
file and forwards it). For one representative config per configs/<family>/
directory this builds the detector FROM THE CONFIG FILE, runs the training
loss through the same signature dispatch tools/train.py uses (batch of two
images, the second with zero gts — the reference's standard corner case),
and runs inference ``get_bboxes`` — so config-file wiring (not just module
construction) is executed end-to-end and "builds but untrainable through
tools/train.py" bugs cannot recur."""
import glob
import inspect
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import Config
from tpudet.models.builder import build_detector

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _family_configs():
    """One representative config per configs/<family>/ dir (prefer r50 /
    the shortest name — the smallest member of the family)."""
    fams = {}
    for path in sorted(glob.glob(osp.join(REPO, 'configs', '*', '*.py'))):
        if osp.basename(path).startswith('_'):
            continue
        fam = osp.basename(osp.dirname(path))
        fams.setdefault(fam, []).append(path)
    picks = []
    for fam, paths in sorted(fams.items()):
        r50 = [p for p in paths if 'r50' in osp.basename(p)]
        pool = r50 or paths
        picks.append(min(pool, key=lambda p: len(osp.basename(p))))
    return picks


CONFIGS = _family_configs()


def _input_size(cfg):
    """Smallest input the config's pad contract allows."""
    divisor = 32
    fixed = None
    for t in cfg['data']['test'].get('pipeline', []):
        transforms = t.get('transforms', [t])
        for tr in transforms:
            if tr.get('type') == 'Pad' and 'size_divisor' in tr:
                divisor = max(divisor, tr['size_divisor'])
    mtype = cfg['model'].get('backbone', {}).get('type', '')
    if mtype == 'SSDVGG':
        fixed = cfg['model']['backbone'].get('input_size', 300)
    return fixed or max(64, divisor)


def _demo_batch(size, num_classes, with_masks, sem_stride=8):
    rng = np.random.RandomState(0)
    b, g = 2, 4
    img = rng.rand(b, size, size, 3).astype(np.float32)
    gt_bboxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_valid = np.zeros((b, g), bool)
    xy = rng.rand(g, 2) * size * 0.5
    wh = rng.rand(g, 2) * size * 0.3 + 12
    gt_bboxes[0] = np.concatenate([xy, np.minimum(xy + wh, size)], -1)
    gt_labels[0] = rng.randint(0, num_classes, g)
    gt_valid[0] = True  # image 1 stays all-empty
    batch = {
        'img': jnp.asarray(img),
        'gt_bboxes': jnp.asarray(gt_bboxes),
        'gt_labels': jnp.asarray(gt_labels),
        'gt_valid': jnp.asarray(gt_valid),
        'proposals': jnp.tile(
            jnp.asarray([[4., 4., float(size // 2), float(size // 2)]]),
            (b, 16, 1)).reshape(b, 16, 4),
        'prop_valid': jnp.ones((b, 16), bool),
    }
    if with_masks:
        batch['gt_frame_masks'] = jnp.ones((b, g, 16, 16), jnp.float32)
        batch['gt_semantic_seg'] = jnp.zeros(
            (b, size // sem_stride, size // sem_stride), jnp.int32)
    return batch


def _loss_from_config(model, variables, batch):
    """The tools/train.py loss dispatch (apis/train.py): forward_train by
    signature when present, else apply + head loss."""
    if hasattr(model, 'forward_train'):
        args = []
        for name in inspect.signature(model.forward_train).parameters:
            if name == 'img':
                args.append(batch['img'])
            elif name in batch:
                args.append(batch[name])
            else:
                break
        losses, _ = model.apply(variables, *args, method='forward_train',
                                mutable=['batch_stats'])
        return losses
    outputs = model.apply(variables, batch['img'])
    return model.loss(outputs, batch['gt_bboxes'], batch['gt_labels'],
                      batch['gt_valid'])


@pytest.mark.parametrize('cfg_path', CONFIGS,
                         ids=[osp.basename(osp.dirname(p)) for p in CONFIGS])
def test_family_config_trains_and_infers(cfg_path):
    cfg = Config.fromfile(cfg_path)
    model = build_detector(cfg['model'])
    size = _input_size(cfg)
    num_classes = 80
    for key in ('bbox_head', 'roi_head', 'rpn_head'):
        sub = cfg['model'].get(key)
        if isinstance(sub, dict) and 'num_classes' in sub:
            num_classes = sub['num_classes']
            break
    batch = _demo_batch(size, max(num_classes, 1), with_masks=True)

    # init exactly like create_train_state (through forward_train when
    # present so train-only branches own their params)
    if hasattr(model, 'forward_train'):
        args = []
        for name, p in inspect.signature(
                model.forward_train).parameters.items():
            if name == 'img':
                args.append(batch['img'])
            elif name in batch:
                args.append(batch[name])
            elif p.default is not inspect.Parameter.empty:
                break
            else:
                pytest.fail(f'no dummy for forward_train arg {name!r}')
        variables = model.init(jax.random.PRNGKey(0), *args,
                               method='forward_train')
    else:
        variables = model.init(jax.random.PRNGKey(0), batch['img'])

    losses = _loss_from_config(model, variables, batch)
    assert any('loss' in k for k in losses), losses.keys()
    for k, v in losses.items():
        if 'loss' in k:
            val = float(jnp.sum(v))
            assert np.isfinite(val), (cfg_path, k, val)

    infer_vars = {'params': variables['params']}
    if 'batch_stats' in variables:
        infer_vars['batch_stats'] = variables['batch_stats']
    # Fast R-CNN consumes precomputed proposals at inference (reference
    # two_stage.py simple_test 'proposals' arg)
    extra = [batch[n] for n in inspect.signature(
        type(model).__call__).parameters if n in batch and n != 'img']
    outputs = model.apply(infer_vars, batch['img'], *extra)
    res = model.get_bboxes(outputs)
    bboxes, scores = res[0], res[1]
    assert bboxes.shape[0] == 2 and bboxes.shape[-1] == 4
    assert np.isfinite(np.asarray(bboxes)).all()
    assert np.isfinite(np.asarray(scores)).all()
