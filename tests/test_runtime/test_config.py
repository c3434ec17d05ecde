"""Every config file in configs/ must parse and build (reference test
strategy: tests/test_runtime/test_config.py builds every config)."""
import glob
import os.path as osp

import pytest

from tpudet.config import Config
from tpudet.models.builder import build_detector

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
CONFIGS = sorted(glob.glob(osp.join(REPO, 'configs', '**', '*.py'),
                           recursive=True))


@pytest.mark.parametrize('cfg_path', CONFIGS)
def test_config_builds(cfg_path):
    cfg = Config.fromfile(cfg_path)
    assert 'model' in cfg
    model = build_detector(cfg['model'])
    assert model.backbone is not None
    if 'rpn_head' in cfg['model'] and 'roi_head' in cfg['model']:
        assert model.rpn_head is not None and model.roi_head is not None
    elif 'rpn_head' in cfg['model']:  # proposal-only RPN
        assert model.rpn_head is not None
    elif 'roi_head' in cfg['model']:  # FastRCNN
        assert model.roi_head is not None
    else:
        assert model.bbox_head is not None
    # data section sanity
    assert 'train' in cfg['data'] and 'val' in cfg['data']
    for split in ('train', 'val', 'test'):
        if split in cfg['data']:
            assert 'pipeline' in cfg['data'][split]


def test_base_inheritance_and_delete():
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        base = osp.join(d, 'base.py')
        child = osp.join(d, 'child.py')
        with open(base, 'w') as f:
            f.write("model = dict(type='A', backbone=dict(type='B', x=1), "
                    "n=dict(a=2))\nlr = 0.1\n")
        with open(child, 'w') as f:
            f.write("_base_ = 'base.py'\n"
                    "model = dict(backbone=dict(x=5), "
                    "n=dict(_delete_=True, b=3))\n")
        cfg = Config.fromfile(child)
        assert cfg['model']['backbone'] == {'type': 'B', 'x': 5}
        assert cfg['model']['n'] == {'b': 3}  # _delete_ replaced subtree
        assert cfg['lr'] == 0.1
        cfg.merge_from_dict({'model.backbone.x': 9, 'lr': 0.5})
        assert cfg['model']['backbone']['x'] == 9
        assert cfg['lr'] == 0.5


def test_collect_env():
    from tpudet.utils.env import collect_env
    env = collect_env()
    assert 'JAX' in env and 'Python' in env
