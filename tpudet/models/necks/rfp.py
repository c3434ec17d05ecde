"""RFP — Recursive Feature Pyramid (reference mmdet/models/necks/rfp.py).

An FPN whose outputs are fed back (through an ASPP context module) into a
second, weight-independent backbone pass; the re-extracted pyramid is fused
with the previous one by a zero-init sigmoid gate (starts at 0.5/0.5).
The first input element is the raw image (DetectoRSResNet
``output_img=True``), consumed here for the recursive pass. The same FPN
weights process every pass (rfp.py:115-135).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NECKS
from .fpn import FPN


class ASPP(nn.Module):
    """4-branch atrous pyramid (rfp.py:12-55): dilations (1, 3, 6) on the
    map + a 1x1 on the global average, ReLU'd and concatenated."""
    out_channels: int = 64
    dilations: Tuple[int, ...] = (1, 3, 6, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        for i, d in enumerate(self.dilations):
            last = i == len(self.dilations) - 1
            inp = gap if last else x
            k = 1 if last else 3
            pad = 0 if last else d
            v = nn.Conv(self.out_channels, (k, k),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(d, d), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'aspp{i}')(inp)
            outs.append(jax.nn.relu(v))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, axis=-1)


@NECKS.register_module()
class RFP(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    rfp_steps: int = 2
    rfp_backbone: Optional[Dict] = None
    aspp_out_channels: int = 64
    aspp_dilations: Tuple[int, ...] = (1, 3, 6, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from ..builder import build_backbone
        img = inputs[0]
        feats = tuple(inputs[1:])
        fpn = FPN(self.in_channels, self.out_channels, self.num_outs,
                  self.start_level, self.add_extra_convs, dtype=self.dtype,
                  name='fpn')
        x = fpn(feats, train)

        aspp = ASPP(self.aspp_out_channels, self.aspp_dilations,
                    dtype=self.dtype, name='rfp_aspp')
        rfp_weight = nn.Conv(1, (1, 1), use_bias=True,
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             dtype=self.dtype, name='rfp_weight')
        for step in range(1, self.rfp_steps):
            rfp_feats = [x[0]] + [aspp(x[i]) for i in range(1, len(x))]
            backbone = build_backbone({
                **dict(self.rfp_backbone), 'output_img': False,
                'name': f'rfp_module{step - 1}'})
            new_feats = backbone(img, rfp_feats, train)
            x_new = fpn(new_feats, train)
            fused = []
            for a, b in zip(x_new, x):
                w = jax.nn.sigmoid(rfp_weight(a))
                fused.append(w * a + (1 - w) * b)
            x = tuple(fused)
        return x
