"""DETR transformer (reference mmdet/models/utils/transformer.py and
positional_encoding.py), flax.linen.

Post-norm encoder/decoder exactly as DETR: positional encodings are added
to q/k at every attention (never to v), the decoder returns ALL layer
outputs for deep supervision, and the sine positional encoding follows the
reference normalize=True form (positional_encoding.py:12-78).

All shapes static: the padded feature map is flattened to (B, HW, C); no
key-padding masks are needed because tpudet batches are letterboxed to a
fixed square (padding pixels carry image mean, as in reference batches
padded with `Pad`).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.,
                             normalize: bool = True,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6) -> np.ndarray:
    """(H*W, 2*num_feats) sine/cosine embedding, reference
    positional_encoding.py:48-78 with an all-valid mask."""
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = temperature**(2 * (np.arange(num_feats) // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])],
                     axis=-1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])],
                     axis=-1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).reshape(h * w,
                                                           2 * num_feats)


class SinePositionalEncoding:
    def __init__(self, num_feats: int = 128, temperature: float = 10000.,
                 normalize: bool = True):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize

    def __call__(self, h, w):
        return sine_positional_encoding(h, w, self.num_feats,
                                        self.temperature, self.normalize)


class _MHA(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            out_features=self.dim, dtype=self.dtype, name='attn')(
                inputs_q=q, inputs_k=k, inputs_v=v)


class _FFN(nn.Module):
    dim: int
    ffn_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name='fc1')(x)
        h = jax.nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name='fc2')(h)


class EncoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos):
        # post-norm: attn -> add -> LN -> ffn -> add -> LN
        q = k = x + pos
        x = x + _MHA(self.dim, self.num_heads, self.dtype,
                     name='self_attn')(q, k, x)
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        x = x + _FFN(self.dim, self.ffn_dim, self.dtype, name='ffn')(x)
        return nn.LayerNorm(dtype=self.dtype, name='norm2')(x)


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, pos):
        q = k = tgt + query_pos
        tgt = tgt + _MHA(self.dim, self.num_heads, self.dtype,
                         name='self_attn')(q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm1')(tgt)
        tgt = tgt + _MHA(self.dim, self.num_heads, self.dtype,
                         name='cross_attn')(tgt + query_pos, memory + pos,
                                            memory)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm2')(tgt)
        tgt = tgt + _FFN(self.dim, self.ffn_dim, self.dtype, name='ffn')(tgt)
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(tgt)


class DetrTransformer(nn.Module):
    """Encoder-decoder; returns (num_dec_layers, B, Q, C) decoder states."""
    dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, query_embed):
        """x (B, HW, C); pos (HW, C); query_embed (Q, C)."""
        b = x.shape[0]
        pos = pos[None].astype(x.dtype)
        memory = x
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                  self.dtype, name=f'enc{i}')(memory, pos)
        query_pos = jnp.broadcast_to(query_embed[None],
                                     (b,) + query_embed.shape).astype(x.dtype)
        tgt = jnp.zeros_like(query_pos)
        post_norm = nn.LayerNorm(dtype=self.dtype, name='post_norm')
        outs = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                               self.dtype, name=f'dec{i}')(tgt, memory,
                                                           query_pos, pos)
            outs.append(post_norm(tgt))
        return jnp.stack(outs, axis=0)
