"""Ecosystem checkpoint shims (tools/model_converters/ecosystem.py) —
the reference's regnet2mmdet.py / detectron2pytorch.py analogues.

Synthetic checkpoints exercising every naming rule are translated and
checked key-by-key against the mmdet/torchvision naming that
tpudet's import path (torch_to_jax.py / weight_convert.py) consumes.
"""
import importlib.util
import os.path as osp

import numpy as np

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    'ecosystem', osp.join(REPO, 'tools/model_converters/ecosystem.py'))
eco = importlib.util.module_from_spec(spec)
spec.loader.exec_module(eco)


def test_regnet_pycls_naming():
    state = {
        'stem.conv.weight': np.zeros((32, 3, 3, 3)),
        'stem.bn.weight': np.zeros(32),
        'stem.bn.running_mean': np.zeros(32),
        # stage 1 block 1: projection shortcut + bottleneck f-branch
        's1.b1.proj.weight': np.zeros((24, 32, 1, 1)),
        's1.b1.bn.weight': np.zeros(24),
        's1.b1.f.a.weight': np.zeros((24, 32, 1, 1)),
        's1.b1.f.a_bn.weight': np.zeros(24),
        's1.b1.f.b.weight': np.zeros((24, 24, 3, 3)),
        's1.b1.f.b_bn.running_var': np.zeros(24),
        's1.b1.f.c.weight': np.zeros((24, 24, 1, 1)),
        's1.b1.f.c_bn.bias': np.zeros(24),
        # stage 2 block 2 (no proj)
        's2.b2.f.a.weight': np.zeros((56, 56, 1, 1)),
        'head.fc.weight': np.zeros((1000, 440)),
        's1.b1.f.se.f_ex.0.weight': np.zeros((6, 24, 1, 1)),  # unsupported
    }
    out, skipped = eco.regnet_pycls_to_mmdet_keys(state)
    assert set(out) == {
        'conv1.weight', 'bn1.weight', 'bn1.running_mean',
        'layer1.0.downsample.0.weight', 'layer1.0.downsample.1.weight',
        'layer1.0.conv1.weight', 'layer1.0.bn1.weight',
        'layer1.0.conv2.weight', 'layer1.0.bn2.running_var',
        'layer1.0.conv3.weight', 'layer1.0.bn3.bias',
        'layer2.1.conv1.weight', 'fc.weight',
    }
    assert skipped == ['s1.b1.f.se.f_ex.0.weight']


def _fake_detectron_blobs(depth=50):
    blobs = {'conv1_w': np.zeros((64, 3, 7, 7)),
             'res_conv1_bn_s': np.ones(64), 'res_conv1_bn_b': np.zeros(64)}
    for stage, n in enumerate(eco.RESNET_BLOCKS[depth], start=1):
        for b in range(n):
            pre = f'res{stage + 1}_{b}'
            if b == 0:
                blobs[f'{pre}_branch1_w'] = np.zeros((4, 4, 1, 1))
                blobs[f'{pre}_branch1_bn_s'] = np.ones(4)
                blobs[f'{pre}_branch1_bn_b'] = np.zeros(4)
            for letter in 'abc':
                blobs[f'{pre}_branch2{letter}_w'] = np.zeros((4, 4, 1, 1))
                blobs[f'{pre}_branch2{letter}_bn_s'] = np.ones(4)
                blobs[f'{pre}_branch2{letter}_bn_b'] = np.zeros(4)
    blobs['fc1000_w'] = np.zeros((1000, 2048))  # head: not converted
    return blobs


def test_detectron_resnet_naming():
    blobs = _fake_detectron_blobs(50)
    out, skipped = eco.detectron_resnet_to_mmdet_keys(blobs, 50)
    assert 'conv1.weight' in out
    assert 'bn1.weight' in out and 'bn1.running_var' in out
    # affine-channel BN: identity running stats
    np.testing.assert_array_equal(out['bn1.running_mean'], np.zeros(64))
    np.testing.assert_array_equal(out['bn1.running_var'], np.ones(64))
    # stage/block/branch renaming spot checks (res2_0 -> layer1.0 etc.)
    assert 'layer1.0.downsample.0.weight' in out
    assert 'layer1.0.downsample.1.weight' in out
    assert 'layer3.5.conv3.weight' in out       # res4_5_branch2c
    assert 'layer4.2.bn2.bias' in out           # res5_2_branch2b_bn
    assert skipped == ['fc1000_w']
    # every expected torchvision key for every block exists
    for stage, n in enumerate(eco.RESNET_BLOCKS[50], start=1):
        for b in range(n):
            for k in (1, 2, 3):
                assert f'layer{stage}.{b}.conv{k}.weight' in out
                assert f'layer{stage}.{b}.bn{k}.weight' in out
