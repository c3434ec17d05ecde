"""ResLayer shared head + C4 RoI head (reference mmdet/models/
roi_heads/shared_heads/res_layer.py and models/utils/res_layer.py; the
legacy C4 configs, e.g. configs/faster_rcnn/faster_rcnn_r50_caffe_c4).

The C4 family runs the backbone only through stage 3 (stride 16), RPN
on that single map, pools 14x14 RoI features, and runs ResNet's stage-4
bottlenecks (stride 2 -> 7x7, 2048 channels) as a head shared between
classification and regression, followed by global average pooling.
BN in the shared head follows the reference's ``norm_eval=True``
(statistics frozen; per-RoI batches would corrupt them).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DETECTORS, HEADS
from ..detectors.two_stage import TwoStageDetector
from .standard_roi_head import StandardRoIHead


class ResLayerSharedHead(nn.Module):
    """ResNet stage 4: 3 bottlenecks, first strided (res_layer.py)."""
    planes: int = 512
    num_blocks: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            # frozen statistics (reference shared head norm_eval=True)
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        def conv(f, k, s, name):
            return nn.Conv(f, (k, k), (s, s), padding='SAME',
                           use_bias=False, dtype=self.dtype,
                           kernel_init=nn.initializers.he_normal(),
                           name=name)

        for i in range(self.num_blocks):
            stride = 2 if i == 0 else 1
            identity = x
            out = jax.nn.relu(bn(f'b{i}_bn1')(
                conv(self.planes, 1, 1, f'b{i}_conv1')(x)))
            out = jax.nn.relu(bn(f'b{i}_bn2')(
                conv(self.planes, 3, stride, f'b{i}_conv2')(out)))
            out = bn(f'b{i}_bn3')(
                conv(self.planes * 4, 1, 1, f'b{i}_conv3')(out))
            if i == 0:
                identity = bn('ds_bn')(
                    conv(self.planes * 4, 1, stride, 'ds_conv')(x))
            x = jax.nn.relu(out + identity)
        return x


@HEADS.register_module()
class C4RoIHead(StandardRoIHead):
    """Single-level (stride 16) 14x14 pool -> shared ResLayer -> GAP ->
    cls/reg linears (reference StandardRoIHead + shared_head +
    BBoxHead(with_avg_pool=True))."""
    roi_size: int = 14
    featmap_strides: Tuple[int, ...] = (16,)

    def setup(self):
        self.shared_head = ResLayerSharedHead(dtype=self.dtype)
        self.fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name='fc_cls')
        self.fc_reg = nn.Dense(4 * self.num_classes, dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.001),
                               name='fc_reg')

    def __call__(self, feats, rois, roi_valid, train: bool = False):
        pooled = self.extract(feats, rois, roi_valid)  # (B, P, 14, 14, C)
        b, p = pooled.shape[:2]
        x = pooled.reshape((b * p,) + pooled.shape[2:])
        x = self.shared_head(x, train)  # (B*P, 7, 7, 2048)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        cls = self.fc_cls(x)
        reg = self.fc_reg(x)
        return (cls.reshape(b, p, -1), reg.reshape(b, p, -1))


@DETECTORS.register_module()
class FasterRCNNC4(TwoStageDetector):
    """Named wrapper for the C4 configs."""
