"""SSD-VGG16 backbone (reference mmdet/models/backbones/ssd_vgg.py):
VGG-16 conv stages (fc6/fc7 as dilated convs), extra SSD feature layers,
and the learnable L2Norm on the conv4_3 output.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONES

VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


def _conv(features, kernel=3, stride=1, dilation=1, dtype=None, name=None):
    pad = dilation * (kernel // 2)
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation), use_bias=True,
                   dtype=dtype, kernel_init=nn.initializers.he_normal(),
                   name=name)


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with learnable scale (SSD conv4_3)."""
    scale_init: float = 20.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale',
                           nn.initializers.constant(self.scale_init),
                           (x.shape[-1],))
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32)**2, axis=-1,
                                keepdims=True) + 1e-10)
        return (x / norm * scale).astype(x.dtype)


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    input_size: int = 300
    dtype: Any = None

    # extra layers: (channels, kernel, stride) pairs per reference
    @property
    def extra_setting(self):
        if self.input_size == 300:
            return ((256, 1, 1), (512, 3, 2), (128, 1, 1), (256, 3, 2),
                    (128, 1, 1), (256, 3, 1), (128, 1, 1), (256, 3, 1))
        return ((256, 1, 1), (512, 3, 2), (128, 1, 1), (256, 3, 2),
                (128, 1, 1), (256, 3, 2), (128, 1, 1), (256, 3, 2),
                (128, 1, 1), (256, 4, 1))

    @classmethod
    def out_channels(cls, input_size=300):
        return (512, 1024, 512, 256, 256, 256) if input_size == 300 else \
            (512, 1024, 512, 256, 256, 256, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for stage, (n_convs, ch) in enumerate(VGG16_STAGES):
            for j in range(n_convs):
                x = jax.nn.relu(
                    _conv(ch, 3, dtype=self.dtype,
                          name=f'conv{stage + 1}_{j + 1}')(x))
            if stage == 3:  # conv4_3 output, L2-normalized
                outs.append(L2Norm(dtype=self.dtype, name='l2_norm')(x))
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding='SAME')  # torch ceil_mode
            else:  # pool5: 3x3 stride 1 (SSD variant)
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=[(1, 1), (1, 1)])
        # fc6 (dilated) + fc7
        x = jax.nn.relu(_conv(1024, 3, dilation=6, dtype=self.dtype,
                              name='fc6')(x))
        x = jax.nn.relu(_conv(1024, 1, dtype=self.dtype, name='fc7')(x))
        outs.append(x)
        # extra layers: every second conv output is a pyramid level
        for i, (ch, k, s) in enumerate(self.extra_setting):
            pad = 1 if (k == 3 and s == 2) else 0
            x = nn.Conv(ch, (k, k), (s, s), padding=[(pad, pad), (pad, pad)],
                        use_bias=True, dtype=self.dtype,
                        kernel_init=nn.initializers.he_normal(),
                        name=f'extra{i}')(x)
            x = jax.nn.relu(x)
            if i % 2 == 1:
                outs.append(x)
        return tuple(outs)
