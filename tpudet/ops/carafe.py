"""CARAFE — Content-Aware ReAssembly of FEatures (reference mmcv
ops/carafe.py CARAFEPack, used by mmdet/models/necks/fpn_carafe.py).

Pure-XLA rework of the CUDA kernel: the k_up x k_up neighborhood taps are
materialized as shifted copies of the source map (zero padding at the
borders, matching the CUDA kernel's bounds check), nearest-upsampled to
the target resolution, and mixed with the softmax-normalized predicted
kernels. Everything is dense elementwise math that XLA fuses; no
gather/scatter.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def carafe(x, kernels, k_up: int = 5, scale: int = 2):
    """x (B, H, W, C); kernels (B, H*scale, W*scale, k_up*k_up) already
    softmax-normalized. Returns (B, H*scale, W*scale, C)."""
    b, h, w, c = x.shape
    r = k_up // 2
    pad = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    taps = []
    for dy in range(k_up):
        for dx in range(k_up):
            taps.append(jax.lax.dynamic_slice(
                pad, (0, dy, dx, 0), (b, h, w, c)))
    taps = jnp.stack(taps, axis=3)  # (B, H, W, k*k, C)
    # nearest-upsample the taps to the target grid
    taps = jnp.repeat(jnp.repeat(taps, scale, axis=1), scale, axis=2)
    return jnp.sum(taps * kernels[..., None], axis=3)


class CARAFEPack(nn.Module):
    """Kernel prediction (1x1 compressor -> encoder conv -> pixel-shuffle
    -> softmax) + reassembly (mmcv CARAFEPack semantics)."""
    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        s, k = self.scale_factor, self.up_kernel
        comp = nn.Conv(self.compressed_channels, (1, 1), use_bias=True,
                       dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name='channel_compressor')(x)
        enc = nn.Conv(k * k * s * s, (self.encoder_kernel,) * 2,
                      padding='SAME', use_bias=True, dtype=self.dtype,
                      kernel_init=nn.initializers.normal(0.001),
                      name='content_encoder')(comp)
        b, h, w, _ = enc.shape
        # pixel shuffle: (B,H,W,k*k*s*s) -> (B,H*s,W*s,k*k)
        enc = enc.reshape(b, h, w, k * k, s, s)
        enc = jnp.transpose(enc, (0, 1, 4, 2, 5, 3))
        enc = enc.reshape(b, h * s, w * s, k * k)
        kernels = jax.nn.softmax(enc.astype(jnp.float32), axis=-1)
        return carafe(x.astype(jnp.float32), kernels, k, s)
