#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Ecosystem checkpoint import shims (reference tools/model_converters/
regnet2mmdet.py + detectron2pytorch.py analogues).

tpudet's supported weight-import format is the reference's own
mmdet/torchvision naming (conv1/bn1/layerN.M.convK...), consumed by
tools/model_converters/torch_to_jax.py and
tpudet/utils/weight_convert.py. These shims translate the two upstream
ecosystems the reference ships converters for into that format, as pure
key renaming over numpy arrays (no torch/caffe2 dependency):

- pycls RegNet (``model_state`` dicts: stem.conv/stem.bn,
  sN.bM.{proj,bn,f.{a,a_bn,b,b_bn,c,c_bn,se...}}, head.fc)
- Detectron caffe2 ResNet blobs (conv1_w, res_conv1_bn_{s,b},
  res{S}_{B}_branch{1,2a,2b,2c}[_bn]_{w,s,b}); Detectron folds BN into
  affine channels, so running stats are re-initialized to (0, 1) exactly
  as the reference converter does.

The reference's third converter, upgrade_model_version.py (mmdet 1.x ->
2.x state dicts), is N/A here: tpudet targets the 2.x naming only.
"""
import argparse
import pickle
import re

import numpy as np


def regnet_pycls_to_mmdet_keys(model_state):
    """pycls RegNet ``model_state`` -> mmdet/torchvision-style dict."""
    out, skipped = {}, []
    f_map = {'a': 'conv1', 'a_bn': 'bn1', 'b': 'conv2', 'b_bn': 'bn2',
             'c': 'conv3', 'c_bn': 'bn3'}
    for key, val in model_state.items():
        parts = key.split('.')
        if key.startswith('stem.conv'):
            out[key.replace('stem.conv', 'conv1')] = val
        elif key.startswith('stem.bn'):
            out[key.replace('stem.bn', 'bn1')] = val
        elif key.startswith('head.fc'):
            out[key.replace('head.fc', 'fc')] = val
        elif re.match(r's\d+$', parts[0]) and re.match(r'b\d+$', parts[1]):
            stage = int(parts[0][1:])
            block = int(parts[1][1:]) - 1  # pycls blocks are 1-based
            leaf = parts[-1]
            mod = parts[2]
            if block == 0 and mod == 'proj':
                new = f'layer{stage}.{block}.downsample.0.{leaf}'
            elif block == 0 and mod == 'bn':
                new = f'layer{stage}.{block}.downsample.1.{leaf}'
            elif mod == 'f' and parts[3] in f_map:
                new = f'layer{stage}.{block}.{f_map[parts[3]]}.{leaf}'
            else:
                skipped.append(key)
                continue
            out[new] = val
        else:
            skipped.append(key)
    return out, skipped


RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def detectron_resnet_to_mmdet_keys(blobs, depth):
    """Detectron caffe2 ResNet blobs -> mmdet/torchvision-style dict."""
    if depth not in RESNET_BLOCKS:
        raise ValueError(f'depth must be one of {sorted(RESNET_BLOCKS)}')

    out, used = {}, set()

    def conv(caffe, torch_name):
        out[torch_name + '.weight'] = blobs[caffe + '_w']
        used.add(caffe + '_w')
        if caffe + '_b' in blobs:
            out[torch_name + '.bias'] = blobs[caffe + '_b']
            used.add(caffe + '_b')

    def bn(caffe, torch_name):
        # Detectron stores frozen BN as an affine channel (scale s,
        # bias b); stats are identity after folding
        out[torch_name + '.weight'] = blobs[caffe + '_s']
        out[torch_name + '.bias'] = blobs[caffe + '_b']
        n = np.asarray(blobs[caffe + '_s']).shape[0]
        out[torch_name + '.running_mean'] = np.zeros(n, np.float32)
        out[torch_name + '.running_var'] = np.ones(n, np.float32)
        used.update({caffe + '_s', caffe + '_b'})

    conv('conv1', 'conv1')
    bn('res_conv1_bn', 'bn1')
    for stage, n_blocks in enumerate(RESNET_BLOCKS[depth], start=1):
        for b in range(n_blocks):
            pre = f'res{stage + 1}_{b}'
            if b == 0:
                conv(f'{pre}_branch1', f'layer{stage}.{b}.downsample.0')
                bn(f'{pre}_branch1_bn', f'layer{stage}.{b}.downsample.1')
            for k, letter in enumerate('abc', start=1):
                conv(f'{pre}_branch2{letter}', f'layer{stage}.{b}.conv{k}')
                bn(f'{pre}_branch2{letter}_bn', f'layer{stage}.{b}.bn{k}')
    skipped = [k for k in blobs if k not in used]
    return out, skipped


def main():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('src', help='pycls .pth / detectron .pkl checkpoint')
    p.add_argument('dst', help='output .npz in mmdet naming')
    p.add_argument('--format', required=True,
                   choices=['pycls-regnet', 'detectron-resnet'])
    p.add_argument('--depth', type=int, default=50,
                   help='ResNet depth (detectron format)')
    args = p.parse_args()

    if args.src.endswith('.pkl'):
        with open(args.src, 'rb') as f:
            ckpt = pickle.load(f, encoding='latin1')
    else:
        import torch
        ckpt = torch.load(args.src, map_location='cpu')
    for key in ('model_state', 'blobs', 'state_dict', 'model'):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    ckpt = {k: np.asarray(v) for k, v in ckpt.items()
            if not k.endswith('num_batches_tracked')}

    if args.format == 'pycls-regnet':
        out, skipped = regnet_pycls_to_mmdet_keys(ckpt)
    else:
        out, skipped = detectron_resnet_to_mmdet_keys(ckpt, args.depth)
    for k in skipped:
        print(f'not converted: {k}')
    np.savez(args.dst, **out)
    print(f'wrote {len(out)} arrays ({len(skipped)} skipped) to {args.dst}')


if __name__ == '__main__':
    main()
