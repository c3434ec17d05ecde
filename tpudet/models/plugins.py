"""Backbone plugin blocks + norm/conv variants (flax.linen, NHWC).

Capability rebuild of the reference's ResNet plugin mechanism
(mmdet/models/backbones/resnet.py:110-136 make_block_plugins) and the
mmcv bricks it instantiates:

- :class:`ContextBlock` — GCNet global-context block
  (configs/gcnet, mmcv ContextBlock semantics);
- :class:`GeneralizedAttention` — empirical-attention block
  (configs/empirical_attention, mmcv GeneralizedAttention with
  spatial_range=-1, the setting every reference config uses);
- :class:`WSConv` — weight-standardized conv (configs/gn+ws);
- :func:`make_norm` — BN/GN switch (configs/gn norm_cfg).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import Registry

PLUGIN_LAYERS = Registry('plugin layer')


def make_norm(norm: str, train: bool, dtype=None, name: str = 'bn',
              gn_groups: int = 32, bn_eps: float = 1e-5,
              bn_momentum: float = 0.9):
    """BN (default) or GN ('GN') layer factory."""
    if norm == 'GN':
        return nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5, dtype=dtype,
                            name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=bn_momentum,
                        epsilon=bn_eps, dtype=dtype, name=name)


class WSConv(nn.Module):
    """Weight-standardized conv (Qiao et al., 'Weight Standardization';
    mmcv ConvWS2d): kernel standardized over (H, W, I) per output channel
    before the convolution.  Pairs with GN in configs/gn+ws."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2 if self.padding is None else self.padding
        in_ch = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (k, k, in_ch // self.groups, self.features))
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        # torch std (unbiased) over all non-output axes
        n = k * k * (in_ch // self.groups)
        var = jnp.sum((kernel - mean)**2, axis=(0, 1, 2),
                      keepdims=True) / max(n - 1, 1)
        w = (kernel - mean) / (jnp.sqrt(var) + self.eps)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=self.groups)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + b.astype(dtype)
        return y


@PLUGIN_LAYERS.register_module()
class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv ContextBlock; configs/gcnet).

    attention pooling (or avg) -> 1x1 bottleneck + LayerNorm + ReLU ->
    1x1 expand -> channel_add (and/or channel_mul) fusion.
    """
    in_channels: int
    ratio: float = 1. / 16
    pooling_type: str = 'att'
    fusion_types: Tuple[str, ...] = ('channel_add',)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        planes = max(int(self.in_channels * self.ratio), 1)
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name='conv_mask')(x)  # (B, H, W, 1)
            mask = jax.nn.softmax(mask.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum('bnc,bno->boc', x.reshape(b, h * w, c),
                                 mask)  # (B, 1, C)
            context = context.reshape(b, 1, 1, c)
        else:
            context = jnp.mean(x, axis=(1, 2), keepdims=True)

        def transform(name):
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f'{name}_conv1')(context)
            t = nn.LayerNorm(dtype=self.dtype, name=f'{name}_ln')(t)
            t = nn.relu(t)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           name=f'{name}_conv2')(t)

        out = x
        if 'channel_mul' in self.fusion_types:
            out = out * jax.nn.sigmoid(transform('channel_mul'))
        if 'channel_add' in self.fusion_types:
            out = out + transform('channel_add')
        return out


@PLUGIN_LAYERS.register_module()
class GeneralizedAttention(nn.Module):
    """Empirical-attention block (mmcv GeneralizedAttention with
    spatial_range=-1; configs/empirical_attention).

    ``attention_type`` is a 4-char '0'/'1' mask enabling the four energy
    terms of the empirical attention paper:
      [0] query & key content, [1] query content & relative position,
      [2] key content only (bias on keys), [3] relative position only.
    ``kv_stride`` subsamples keys/values (the reference configs use 2).
    """
    in_channels: int
    spatial_range: int = -1
    num_heads: int = 9
    position_embedding_dim: int = -1
    position_magnitude: int = 1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.spatial_range == -1, \
            'shim supports spatial_range=-1 (all reference configs)'
        at = [bool(int(c)) for c in self.attention_type]
        b, h, w, c = x.shape
        num_heads = self.num_heads
        qk_dim = c // num_heads
        v_dim = c // num_heads
        pos_dim = (self.position_embedding_dim // 2
                   if self.position_embedding_dim > 0 else c // 2)

        x_kv = x[:, ::self.kv_stride, ::self.kv_stride, :] \
            if self.kv_stride > 1 else x
        x_q = x[:, ::self.q_stride, ::self.q_stride, :] \
            if self.q_stride > 1 else x
        hq, wq = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        if at[0] or at[1]:
            q = nn.Conv(qk_dim * num_heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name='query_conv')(x_q)
            q = q.reshape(b, hq * wq, num_heads, qk_dim)
        if at[0] or at[2]:
            k = nn.Conv(qk_dim * num_heads, (1, 1), use_bias=False,
                        dtype=self.dtype, name='key_conv')(x_kv)
            k = k.reshape(b, hk * wk, num_heads, qk_dim)
        v = nn.Conv(v_dim * num_heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name='value_conv')(x_kv)
        v = v.reshape(b, hk * wk, num_heads, v_dim)

        # energy: (B, heads, Nq, Nk)
        energy = jnp.zeros((b, num_heads, hq * wq, hk * wk), x.dtype)
        scale = 1.0 / math.sqrt(qk_dim)
        if at[0]:
            energy = energy + jnp.einsum('bqhd,bkhd->bhqk', q, k) * scale
        if at[2]:
            key_bias = self.param('key_content_bias',
                                  nn.initializers.zeros,
                                  (num_heads, qk_dim))
            energy = energy + jnp.einsum(
                'hd,bkhd->bhk', key_bias.astype(x.dtype), k)[:, :, None, :]

        if at[1] or at[3]:
            # relative-position embeddings (sine features -> 1-layer mlp)
            def pos_feat(rel, name):
                # rel: (Nq, Nk) normalized deltas
                feat_range = jnp.arange(pos_dim // 2, dtype=x.dtype)
                dim_mat = jnp.power(100.0, feat_range * 4.0 / pos_dim)
                emb = rel[..., None] * self.position_magnitude / dim_mat
                emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)],
                                      axis=-1)  # (Nq, Nk, pos_dim)
                return nn.Dense(num_heads * qk_dim, use_bias=False,
                                dtype=self.dtype, name=name)(emb)

            qy = (jnp.arange(hq, dtype=x.dtype) * self.q_stride)
            qx = (jnp.arange(wq, dtype=x.dtype) * self.q_stride)
            ky = (jnp.arange(hk, dtype=x.dtype) * self.kv_stride)
            kx = (jnp.arange(wk, dtype=x.dtype) * self.kv_stride)
            rel_y = (qy[:, None] - ky[None, :]) / h  # (hq, hk)
            rel_x = (qx[:, None] - kx[None, :]) / w  # (wq, wk)
            ey = pos_feat(rel_y, 'appr_geom_y').reshape(
                hq, hk, num_heads, qk_dim)
            ex = pos_feat(rel_x, 'appr_geom_x').reshape(
                wq, wk, num_heads, qk_dim)
            if at[1]:
                qg = q.reshape(b, hq, wq, num_heads, qk_dim)
                # separable y/x position energies (empirical attention's
                # factorized geometry term)
                e_y = jnp.einsum('byxhd,yzhd->bhyxz', qg, ey) * scale
                e_x = jnp.einsum('byxhd,xzhd->bhyxz', qg, ex) * scale
                energy = energy + (
                    e_y[:, :, :, :, :, None] + e_x[:, :, :, :, None, :]
                ).reshape(b, num_heads, hq * wq, hk * wk)
            if at[3]:
                geom_bias = self.param('geom_bias', nn.initializers.zeros,
                                       (num_heads, qk_dim))
                gb = geom_bias.astype(x.dtype)
                e_y = jnp.einsum('hd,yzhd->hyz', gb, ey)
                e_x = jnp.einsum('hd,xzhd->hxz', gb, ex)
                energy = energy + (
                    e_y[None, :, :, None, :, None] +
                    e_x[None, :, None, :, None, :]
                ).reshape(1, num_heads, hq * wq, hk * wk)

        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v)
        out = out.reshape(b, hq, wq, num_heads * v_dim)
        out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name='proj_conv')(out)
        if self.q_stride > 1:
            out = jax.image.resize(out, (b, h, w, c), method='nearest')
        gamma = self.param('gamma', nn.initializers.zeros, (1,))
        return x + out * gamma.astype(x.dtype)


def build_plugin(cfg: dict, in_channels: int, name: str, dtype=None):
    """Instantiate a registered plugin from a config dict
    (reference resnet.py make_block_plugins)."""
    cfg = dict(cfg)
    kind = cfg.pop('type')
    cfg.pop('postfix', None)
    cls = PLUGIN_LAYERS.get(kind)
    return cls(in_channels=in_channels, dtype=dtype, name=name, **cfg)
