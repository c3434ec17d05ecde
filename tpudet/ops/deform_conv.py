"""Deformable convolution v1/v2 in pure XLA (NHWC).

TPU-native rebuild of the mmcv CUDA ``DeformConv2d`` /
``ModulatedDeformConv2d`` kernels used by the reference's exotic heads
(RepPoints, VFNet star-dcn, GuidedAnchor feature adaption, CentripetalNet,
DetectoRS SAC). Semantics follow mmcv: per output position p and kernel
tap k, the input is bilinearly sampled at
``p*stride + dilation*k_offset + learned_offset[p, k]`` (zero padding
outside), then combined with the conv weight; v2 additionally multiplies
each tap by a sigmoid mask.

Implementation: per tap, a batched row-gather of the 4 bilinear corners
from the flattened (H*W, C) map. Row gathers lower to XLA dynamic-gather;
this is the correctness-first formulation — if a deform-conv ever lands on
a benchmarked hot path, rewrite the sampling as a bounded-window patch
decomposition (extract patches once, weighted sum per tap) which avoids
gathers entirely (see tpudet-perf-findings: avoid image-sized gathers).

Offset channel layout matches torch/mmcv: (..., 2*K*K) ordered
(dy0, dx0, dy1, dx1, ...) over row-major kernel taps.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_gather(flat, xs, ys, h, w):
    """flat (H*W, C); xs/ys (P,) float sample coords. Zero outside."""
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0

    def read(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.astype(jnp.int32), axis=0)  # (P, C)
        return jnp.where(inside[:, None], vals, 0.)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = read(y0i, x0i)
    v01 = read(y0i, x0i + 1)
    v10 = read(y0i + 1, x0i)
    v11 = read(y0i + 1, x0i + 1)
    w00 = ((1 - dy) * (1 - dx))[:, None]
    w01 = ((1 - dy) * dx)[:, None]
    w10 = (dy * (1 - dx))[:, None]
    w11 = (dy * dx)[:, None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def deform_sample(x, offsets, kernel_size: int, stride: int = 1,
                  dilation: int = 1, mask=None):
    """Sample deformable taps.

    x: (B, H, W, C); offsets: (B, Ho, Wo, 2*K*K); mask: (B, Ho, Wo, K*K)
    or None. Returns (B, Ho, Wo, K*K, C) sampled (and masked) taps.
    """
    b, h, w, c = x.shape
    k = kernel_size
    ho, wo = offsets.shape[1:3]
    pad = (dilation * (k - 1)) // 2

    base_y = jnp.arange(ho, dtype=jnp.float32) * stride
    base_x = jnp.arange(wo, dtype=jnp.float32) * stride
    grid_y = jnp.repeat(base_y, wo)  # (P,)
    grid_x = jnp.tile(base_x, ho)

    off = offsets.reshape(b, ho * wo, k * k, 2)

    def per_image(img, off_i, mask_i):
        flat = img.reshape(h * w, c)
        taps = []
        for kk in range(k * k):
            ky, kx = kk // k, kk % k
            ys = grid_y + (ky * dilation - pad) + off_i[:, kk, 0]
            xs = grid_x + (kx * dilation - pad) + off_i[:, kk, 1]
            tap = _bilinear_gather(flat, xs, ys, h, w)  # (P, C)
            if mask_i is not None:
                tap = tap * mask_i[:, kk, None]
            taps.append(tap)
        return jnp.stack(taps, axis=1)  # (P, K*K, C)

    if mask is not None:
        m = mask.reshape(b, ho * wo, k * k)
        out = jax.vmap(per_image)(x, off, m)
    else:
        out = jax.vmap(lambda i, o: per_image(i, o, None))(x, off)
    return out.reshape(b, ho, wo, k * k, c)


def deform_conv2d(x, offsets, weight, kernel_size: int, stride: int = 1,
                  dilation: int = 1, mask=None, bias=None):
    """x (B,H,W,C); weight (K*K, C, Cout); offsets (B,Ho,Wo,2KK)."""
    taps = deform_sample(x, offsets, kernel_size, stride, dilation, mask)
    out = jnp.einsum('bhwkc,kco->bhwo', taps, weight)
    if bias is not None:
        out = out + bias
    return out


class DeformConv2d(nn.Module):
    """v1: offsets given by the caller (mmcv DeformConv2d)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, offsets):
        k = self.kernel_size
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (k * k, x.shape[-1], self.features))
        bias = (self.param('bias', nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return deform_conv2d(
            x.astype(jnp.float32), offsets.astype(jnp.float32),
            weight.astype(jnp.float32), k, self.stride, self.dilation,
            bias=None if bias is None else bias.astype(jnp.float32))


class ModulatedDeformConv2d(nn.Module):
    """v2: conv-predicted offsets + sigmoid mask (mmcv
    ModulatedDeformConv2dPack when ``predict_offsets``)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    predict_offsets: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, offsets=None, mask=None):
        k = self.kernel_size
        if self.predict_offsets and offsets is None:
            # zero-init so the op starts as a regular conv (mmcv *Pack init)
            om = nn.Conv(3 * k * k, (k, k), (self.stride, self.stride),
                         padding='SAME', use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name='conv_offset')(x)
            offsets = om[..., :2 * k * k]
            mask = jax.nn.sigmoid(om[..., 2 * k * k:])
        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (k * k, x.shape[-1], self.features))
        bias = (self.param('bias', nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return deform_conv2d(
            x.astype(jnp.float32), offsets.astype(jnp.float32),
            weight.astype(jnp.float32), k, self.stride, self.dilation,
            mask=None if mask is None else mask.astype(jnp.float32),
            bias=None if bias is None else bias.astype(jnp.float32))
