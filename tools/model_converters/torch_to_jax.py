#!/usr/bin/env python
"""Convert reference (mmdet-yolov4) PyTorch checkpoints to tpudet weights.

Maps the reference's module names (mmdet/models/backbones/darknetcsp.py,
necks/yolo_neck_csp.py, dense_heads/yolocsp_head.py) onto the tpudet flax
tree, transposing conv kernels (O,I,H,W) -> (H,W,I,O) and splitting BN into
params (scale/bias) + batch_stats (mean/var). EMA buffers (``ema_*``,
reference ema_hooks.py:56-64) are converted the same way when requested.

Usage:
    python tools/model_converters/torch_to_jax.py in.pth out.msgpack \
        --model yolov4
"""
from __future__ import annotations

import argparse
import re
from typing import Dict, Tuple

import numpy as np


def _convmodule(dst_prefix: str, src_prefix: str):
    """mmcv ConvModule -> tpudet ConvModule name pairs."""
    return {
        f'{src_prefix}.conv.weight': (f'{dst_prefix}/conv/kernel', 'conv'),
        f'{src_prefix}.bn.weight': (f'{dst_prefix}/bn/scale', 'raw'),
        f'{src_prefix}.bn.bias': (f'{dst_prefix}/bn/bias', 'raw'),
        f'{src_prefix}.bn.running_mean': (f'{dst_prefix}/bn/mean', 'stat'),
        f'{src_prefix}.bn.running_var': (f'{dst_prefix}/bn/var', 'stat'),
    }


def _raw_conv(dst_prefix: str, src_name: str):
    return {f'{src_name}.weight': (f'{dst_prefix}/conv/kernel', 'conv')}


def _bottleneck(dst: str, src: str):
    m = {}
    m.update(_convmodule(f'{dst}/conv1', f'{src}.conv1'))
    m.update(_convmodule(f'{dst}/conv2', f'{src}.conv2'))
    return m


def _bottleneck_csp(dst: str, src: str, repetition: int):
    m = {}
    m.update(_convmodule(f'{dst}/conv1', f'{src}.conv1'))
    m.update(_raw_conv(f'{dst}/conv2', f'{src}.conv2'))
    m.update(_raw_conv(f'{dst}/conv3', f'{src}.conv3'))
    m.update(_convmodule(f'{dst}/conv4', f'{src}.conv4'))
    m[f'{src}.bn.weight'] = (f'{dst}/csp_bn/bn/scale', 'raw')
    m[f'{src}.bn.bias'] = (f'{dst}/csp_bn/bn/bias', 'raw')
    m[f'{src}.bn.running_mean'] = (f'{dst}/csp_bn/bn/mean', 'stat')
    m[f'{src}.bn.running_var'] = (f'{dst}/csp_bn/bn/var', 'stat')
    for i in range(repetition):
        m.update(_bottleneck(f'{dst}/bottlenecks_{i}',
                             f'{src}.bottlenecks.{i}'))
    return m


def _bottleneck_csp2(dst: str, src: str, repetition: int):
    m = {}
    m.update(_convmodule(f'{dst}/conv1', f'{src}.conv1'))
    m.update(_raw_conv(f'{dst}/conv2', f'{src}.conv2'))
    m.update(_convmodule(f'{dst}/conv3', f'{src}.conv3'))
    m[f'{src}.bn.weight'] = (f'{dst}/csp_bn/bn/scale', 'raw')
    m[f'{src}.bn.bias'] = (f'{dst}/csp_bn/bn/bias', 'raw')
    m[f'{src}.bn.running_mean'] = (f'{dst}/csp_bn/bn/mean', 'stat')
    m[f'{src}.bn.running_var'] = (f'{dst}/csp_bn/bn/var', 'stat')
    for i in range(repetition):
        m.update(_bottleneck(f'{dst}/bottlenecks_{i}',
                             f'{src}.bottlenecks.{i}'))
    return m


def _sppv4(dst: str, src: str):
    m = {}
    for c in (1, 3, 4, 5, 6, 7):
        m.update(_convmodule(f'{dst}/conv{c}', f'{src}.conv{c}'))
    m.update(_raw_conv(f'{dst}/conv2', f'{src}.conv2'))
    m[f'{src}.bn.weight'] = (f'{dst}/csp_bn/bn/scale', 'raw')
    m[f'{src}.bn.bias'] = (f'{dst}/csp_bn/bn/bias', 'raw')
    m[f'{src}.bn.running_mean'] = (f'{dst}/csp_bn/bn/mean', 'stat')
    m[f'{src}.bn.running_var'] = (f'{dst}/csp_bn/bn/var', 'stat')
    return m


def _sppv5(dst: str, src: str):
    m = {}
    m.update(_convmodule(f'{dst}/conv1', f'{src}.conv1'))
    m.update(_convmodule(f'{dst}/conv2', f'{src}.conv2'))
    return m


def darknet_csp_mapping(scale: str) -> Dict[str, Tuple[str, str]]:
    """Backbone name map for a DarknetCSP scale (arch table
    darknetcsp.py:357-380; stage layout mirrors tpudet darknet_csp.py)."""
    from tpudet.models.backbones.darknet_csp import DarknetCSP
    stages, reps, channels = DarknetCSP.arch(scale)
    m: Dict[str, Tuple[str, str]] = {}
    for i, (stg, rep) in enumerate(zip(stages, reps)):
        src = f'backbone.{stg}{i}'
        dst = f'backbone/{stg}{i}'
        if stg == 'conv':
            m.update(_convmodule(dst, src))
        elif stg == 'bottleneck':
            m.update(_convmodule(f'{dst}_down', f'{src}.conv_downscale'))
            m.update(_bottleneck(f'{dst}_block', f'{src}.conv_bottleneck'))
        elif stg == 'csp':
            m.update(_convmodule(f'{dst}_down', f'{src}.conv_downscale'))
            m.update(_bottleneck_csp(f'{dst}_csp', f'{src}.conv_csp', rep))
        elif stg == 'focus':
            m.update(_convmodule(f'{dst}/conv', f'{src}.conv'))
        elif stg == 'sppv4':
            m.update(_convmodule(f'{dst}_down', f'{src}.conv_downscale'))
            m.update(_bottleneck_csp(f'{dst}_csp', f'{src}.conv_csp', rep))
            m.update(_sppv4(f'{dst}_spp', f'{src}.spp'))
        elif stg == 'sppv5':
            m.update(_convmodule(f'{dst}_down', f'{src}.conv_downscale'))
            m.update(_sppv5(f'{dst}_spp', f'{src}.spp'))
            m.update(_bottleneck_csp(f'{dst}_csp', f'{src}.conv_csp', rep))
    return m


def yolov4_neck_mapping(num_levels: int, csp_repetition: int):
    m: Dict[str, Tuple[str, str]] = {}
    for i in range(num_levels - 1):
        # forward uses pre_upsample_convs[i-1] at level i (neck:200-211)
        m.update(_convmodule(f'neck/pre_up_conv{i + 1}',
                             f'neck.pre_upsample_convs.{i}'))
        m.update(_convmodule(f'neck/lateral_conv{i}',
                             f'neck.backbone_pre_concat_convs.{i}'))
        m.update(_bottleneck_csp2(f'neck/td_csp{i}',
                                  f'neck.post_upsample_concat_csp.{i}',
                                  csp_repetition))
        m.update(_convmodule(f'neck/down_conv{i}',
                             f'neck.downsample_convs.{i}'))
        m.update(_bottleneck_csp2(f'neck/bu_csp{i}',
                                  f'neck.post_downsample_concat_csp.{i}',
                                  csp_repetition))
    for i in range(num_levels):
        m.update(_convmodule(f'neck/out_conv{i}', f'neck.out_convs.{i}'))
    return m


def yolov5_neck_mapping(num_levels: int, csp_repetition: int):
    m: Dict[str, Tuple[str, str]] = {}
    for i in range(num_levels - 1):
        m.update(_convmodule(f'neck/pre_up_conv{i + 1}',
                             f'neck.pre_upsample_convs.{i}'))
        m.update(_bottleneck_csp(f'neck/td_csp{i}',
                                 f'neck.post_upsample_concat_csp.{i}',
                                 csp_repetition))
        m.update(_convmodule(f'neck/down_conv{i}',
                             f'neck.downsample_convs.{i}'))
        m.update(_bottleneck_csp(f'neck/bu_csp{i}',
                                 f'neck.post_downsample_concat_csp.{i}',
                                 csp_repetition))
    return m


def yolocsp_head_mapping(num_levels: int):
    m: Dict[str, Tuple[str, str]] = {}
    for i in range(num_levels):
        m[f'bbox_head.convs_pred.{i}.weight'] = (
            f'bbox_head/conv_pred{i}/kernel', 'conv')
        m[f'bbox_head.convs_pred.{i}.bias'] = (
            f'bbox_head/conv_pred{i}/bias', 'raw')
    return m


def build_mapping(model: str = 'yolov4', scale: str = 'v4l5p',
                  num_levels: int = 3, csp_repetition: int = 2):
    m = darknet_csp_mapping(scale)
    if model == 'yolov4':
        m.update(yolov4_neck_mapping(num_levels, csp_repetition))
    else:
        m.update(yolov5_neck_mapping(num_levels, csp_repetition))
    m.update(yolocsp_head_mapping(num_levels))
    return m


def convert(state_dict: Dict[str, np.ndarray], mapping) -> Dict:
    """torch state_dict -> {'params': tree, 'batch_stats': tree}."""
    params: Dict = {}
    stats: Dict = {}

    def insert(tree, path, value):
        parts = path.split('/')
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    missing = []
    for src, (dst, kind) in mapping.items():
        if src not in state_dict:
            missing.append(src)
            continue
        v = np.asarray(state_dict[src])
        if kind == 'conv':
            v = v.transpose(2, 3, 1, 0)  # (O,I,H,W) -> (H,W,I,O)
        target = stats if kind == 'stat' else params
        insert(target, dst, v)
    unused = [k for k in state_dict
              if k not in mapping and not k.startswith('ema_')]
    return dict(params=params, batch_stats=stats,
                missing=missing, unused=unused)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src', help='torch .pth checkpoint')
    p.add_argument('dst', help='output .msgpack weights')
    p.add_argument('--model', default='yolov4',
                   choices=['yolov4', 'yolov5'])
    p.add_argument('--scale', default='v4l5p')
    p.add_argument('--csp-repetition', type=int, default=2)
    p.add_argument('--use-ema', action='store_true',
                   help='convert the ema_* buffers instead of online params')
    args = p.parse_args()

    import torch

    from tpudet.utils.checkpoint import save_variables

    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    state = ckpt.get('state_dict', ckpt)
    state = {k: v.numpy() for k, v in state.items()}
    if args.use_ema:
        # reference registers EMA copies as ema_<name with _ for .> buffers
        ema = {}
        for k in list(state):
            if k.startswith('ema_'):
                ema[k[4:].replace('_', '.')] = state[k]
        # note: '.'<->'_' is ambiguous for names containing underscores;
        # fall back to online weights for keys that don't resolve
        state = {**state, **{k: v for k, v in ema.items() if k in state}}

    mapping = build_mapping(args.model, args.scale, 3, args.csp_repetition)
    out = convert(state, mapping)
    if out['missing']:
        print(f"WARNING: {len(out['missing'])} mapped keys missing, e.g. "
              f"{out['missing'][:5]}")
    if out['unused']:
        print(f"note: {len(out['unused'])} source keys unused, e.g. "
              f"{out['unused'][:5]}")
    save_variables(args.dst, dict(params=out['params'],
                                  batch_stats=out['batch_stats']),
                   meta=ckpt.get('meta', {}))
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
