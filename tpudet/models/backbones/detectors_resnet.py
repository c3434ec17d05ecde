"""DetectoRS ResNet (reference mmdet/models/backbones/detectors_resnet.py)
with SAC — Switchable Atrous Convolution (mmcv.ops.saconv) — and RFP
feedback hooks.

SAC: one shared 3x3 kernel evaluated at dilation 1 and (with a zero-init
weight delta) dilation 3, blended by a per-pixel switch
``sigmoid(1x1(avgpool5(x)))``; global-context 1x1 convs before and after.
RFP: the first block of each stage accepts a feedback feature added
through a zero-init 1x1 conv before the residual ReLU
(detectors_resnet.py Bottleneck.rfp_forward).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from .resnet import bn, conv


class SAConv2d(nn.Module):
    features: int
    stride: int = 1
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        # pre-context (global avg -> 1x1, zero-init, added)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name='pre_context')(gap)
        # switch: 5x5 avg pool -> 1x1 conv (weight 0, bias 1 -> starts ~0.73)
        s = nn.avg_pool(x, (5, 5), strides=(self.stride, self.stride),
                        padding=[(2, 2), (2, 2)])
        switch = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.ones, dtype=self.dtype,
                    name='switch')(s))
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (3, 3, x.shape[-1] // self.groups, f))
        delta = self.param('weight_diff', nn.initializers.zeros,
                           (3, 3, x.shape[-1] // self.groups, f))

        def run(k, dil):
            return jax.lax.conv_general_dilated(
                x.astype(k.dtype), k, (self.stride, self.stride),
                [(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
                feature_group_count=self.groups,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out = switch * run(kernel, 1) + (1 - switch) * run(kernel + delta, 3)
        gap2 = jnp.mean(out, axis=(1, 2), keepdims=True)
        out = out + nn.Conv(f, (1, 1), use_bias=True,
                            kernel_init=nn.initializers.zeros,
                            dtype=self.dtype, name='post_context')(gap2)
        return out


class SACBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    with_sac: bool = True
    rfp: bool = False  # accepts an rfp feedback input
    rfp_inplanes: int = 256  # feedback channels (ASPP concat width)
    groups: int = 1  # ResNeXt grouping (detectors_resnext.py Bottleneck)
    base_width: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rfp_feat=None, train: bool = False):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64.)) * self.groups
        out = conv(width, 1, 1, self.dtype, 'conv1')(x)
        out = nn.relu(bn(train, self.dtype, 'bn1')(out))
        if self.with_sac:
            out = SAConv2d(width, stride=self.stride, groups=self.groups,
                           dtype=self.dtype, name='conv2')(out)
        else:
            out = nn.Conv(width, (3, 3), (self.stride, self.stride),
                          padding='SAME', use_bias=False, dtype=self.dtype,
                          feature_group_count=self.groups,
                          kernel_init=nn.initializers.he_normal(),
                          name='conv2')(out)
        out = nn.relu(bn(train, self.dtype, 'bn2')(out))
        out = conv(self.planes * 4, 1, 1, self.dtype, 'conv3')(out)
        out = bn(train, self.dtype, 'bn3')(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, self.dtype,
                            'ds_conv')(x)
            identity = bn(train, self.dtype, 'ds_bn')(identity)
        out = out + identity
        if self.rfp:
            # zero-init feedback conv (detectors_resnet rfp_conv); applied
            # to zeros when no feedback so the param always exists at init
            feed = rfp_feat if rfp_feat is not None else jnp.zeros(
                out.shape[:3] + (self.rfp_inplanes,), out.dtype)
            out = out + nn.Conv(self.planes * 4, (1, 1), use_bias=True,
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                dtype=self.dtype, name='rfp_conv')(feed)
        return nn.relu(out)


ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


@BACKBONES.register_module()
class DetectoRSResNet(nn.Module):
    depth: int = 50
    sac_stages: Tuple[bool, ...] = (False, True, True, True)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    output_img: bool = False  # prepend the raw image (consumed by RFP)
    rfp_inplanes: int = 256
    groups: int = 1  # >1 -> DetectoRS-ResNeXt (detectors_resnext.py)
    base_width: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rfp_feats=None, train: bool = False):
        img = x
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name='conv1')(x)
        x = nn.relu(bn(train, self.dtype, 'bn1')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = 64
        for stage, n in enumerate(ARCH[self.depth]):
            stride = 1 if stage == 0 else 2
            # stage i>0 consumes rfp_feats[i] (detectors_resnet.py:336-340)
            rfp_feat = (None if rfp_feats is None or stage == 0
                        else rfp_feats[stage])
            for i in range(n):
                x = SACBottleneck(
                    planes, stride=stride if i == 0 else 1,
                    downsample=(i == 0), with_sac=self.sac_stages[stage],
                    rfp=(stage > 0 and i == 0),
                    rfp_inplanes=self.rfp_inplanes, groups=self.groups,
                    base_width=self.base_width, dtype=self.dtype,
                    name=f'layer{stage + 1}_{i}')(
                        x, rfp_feat if i == 0 else None, train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        if self.output_img:
            return (img,) + tuple(outs)
        return tuple(outs)


@BACKBONES.register_module()
class DetectoRSResNeXt(DetectoRSResNet):
    """Grouped-bottleneck variant (reference detectors_resnext.py);
    defaults match the x101-32x4d DetectoRS configs."""
    groups: int = 32
    base_width: int = 4
