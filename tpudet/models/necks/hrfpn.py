"""HRFPN and BFP necks (flax.linen, NHWC).

Capability rebuilds of:
- reference mmdet/models/necks/hrfpn.py:77-103 — bilinear-upsample all HRNet
  branches to the highest resolution, concat, 1x1 reduce, average-pool
  pyramid, per-level 3x3 convs (no act).
- reference mmdet/models/necks/bfp.py:69-102 — gather all levels to the
  refine level (max-pool down / nearest up), average, refine (conv or
  non-local), scatter back residually.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import upsample_nearest_2x


def _resize_nearest(x, size):
    """NHWC nearest resize to integer-multiple sizes via broadcast (exact
    power-of-two pyramids; no gather)."""
    b, h, w, c = x.shape
    th, tw = size
    if (th, tw) == (h, w):
        return x
    assert th % h == 0 and tw % w == 0, (x.shape, size)
    ry, rx = th // h, tw // w
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, ry, w, rx, c))
    return x.reshape(b, th, tw, c)


def _pool_to(x, size, kind='max'):
    """Integer-ratio downsample by pooling (mmcv BaseMergeCell._resize /
    F.adaptive_*_pool2d for exact-ratio sizes)."""
    b, h, w, c = x.shape
    th, tw = size
    if (th, tw) == (h, w):
        return x
    assert h % th == 0 and w % tw == 0, (x.shape, size)
    k = (h // th, w // tw)
    if kind == 'max':
        return nn.max_pool(x, k, strides=k)
    return nn.avg_pool(x, k, strides=k)


def _resize_bilinear(x, size):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method='bilinear')


@NECKS.register_module()
class HRFPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    pooling_type: str = 'AVG'
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        size = inputs[0].shape[1:3]
        outs = [inputs[0]] + [
            _resize_bilinear(inputs[i], size) for i in range(1, len(inputs))
        ]
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                      dtype=self.dtype,
                      kernel_init=nn.initializers.xavier_uniform(),
                      name='reduction_conv')(out)
        kind = 'max' if self.pooling_type == 'MAX' else 'avg'
        pyramid = [out] + [
            _pool_to(out, (size[0] >> i, size[1] >> i), kind)
            for i in range(1, self.num_outs)
        ]
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding='SAME', use_bias=True,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f'fpn_conv{i}')(p) for i, p in enumerate(pyramid))


class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (mmcv.cnn.bricks.NonLocal2d with
    reduction=1, use_scale=False — the BFP config, bfp.py:62-67)."""
    channels: int
    reduction: int = 1
    use_scale: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(self.channels // self.reduction, 1)
        conv = lambda f, name: nn.Conv(
            f, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name=name)
        g = conv(inter, 'g')(x).reshape(b, h * w, inter)
        theta = conv(inter, 'theta')(x).reshape(b, h * w, inter)
        phi = conv(inter, 'phi')(x).reshape(b, h * w, inter)
        attn = jnp.einsum('bic,bjc->bij', theta, phi)
        if self.use_scale:
            attn = attn / jnp.sqrt(jnp.asarray(inter, attn.dtype))
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum('bij,bjc->bic', attn, g).reshape(b, h, w, inter)
        # conv_out is zero-init in mmcv so the block starts as identity
        y = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name='conv_out')(y)
        return x + y


@NECKS.register_module()
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Optional[str] = None  # None | 'conv' | 'non_local'
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_levels
        size = inputs[self.refine_level].shape[1:3]
        feats = [
            _pool_to(x, size, 'max') if i < self.refine_level
            else _resize_nearest(x, size) for i, x in enumerate(inputs)
        ]
        bsf = sum(feats) / len(feats)
        if self.refine_type == 'conv':
            bsf = nn.Conv(self.in_channels, (3, 3), padding='SAME',
                          use_bias=True, dtype=self.dtype,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name='refine')(bsf)
        elif self.refine_type == 'non_local':
            bsf = NonLocal2d(self.in_channels, dtype=self.dtype,
                             name='refine')(bsf)
        outs = []
        for i, x in enumerate(inputs):
            osize = x.shape[1:3]
            res = (_resize_nearest(bsf, osize) if i < self.refine_level
                   else _pool_to(bsf, osize, 'max'))
            outs.append(x + res)
        return tuple(outs)
