"""Shared conv/norm/act building blocks (flax.linen, NHWC).

TPU-native equivalent of mmcv's ``ConvModule`` brick used everywhere in the
reference (e.g. mmdet/models/backbones/darknetcsp.py:15-35): conv (no bias)
+ BatchNorm + activation, NHWC so XLA tiles convs straight onto the MXU.

BatchNorm semantics follow the reference configs exactly
(darknetcsp.py:387: eps=0.001, momentum=0.03). Torch's ``momentum`` is the
update fraction (running = (1-m)*running + m*batch); flax's ``momentum`` is
the decay, so torch 0.03 == flax 0.97.

SyncBN (reference: configs/yolov5_ddp/* swap norm_cfg to SyncBN, backed by
an mmcv CUDA+NCCL kernel) needs no separate implementation here: under
``jit`` over a data-sharded mesh, the batch-axis mean/var reductions are
global — XLA inserts the ICI collectives. Cross-device BN *is* the default.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.mish import mish

# Defaults follow torch/mmcv BN defaults (eps 1e-5, momentum 0.1 ->
# flax decay 0.9).  The DarknetCSP fork family overrides these with its
# eps=0.001 momentum=0.03 convention (darknetcsp.py:387) via the
# DARKNET_BN kwargs — see darknet_csp.py / yolo_neck_csp.py.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5
DARKNET_BN = dict(bn_eps=1e-3, bn_momentum=0.97)


def get_activation(act: Optional[Union[str, dict]]) -> Optional[Callable]:
    """Resolve an activation by the reference's config names."""
    if act is None:
        return None
    from collections.abc import Mapping
    if isinstance(act, Mapping):  # dict or flax FrozenDict module field
        name = act['type']
        kwargs = {k: v for k, v in act.items() if k != 'type'}
    else:
        name, kwargs = act, {}
    name = name.lower()
    if name == 'mish':
        return mish
    if name == 'relu':
        return jax.nn.relu
    if name == 'leakyrelu':
        slope = kwargs.get('negative_slope', 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name in ('swish', 'silu'):
        return jax.nn.silu
    if name == 'sigmoid':
        return jax.nn.sigmoid
    if name == 'tanh':
        return jnp.tanh
    raise KeyError(f'unknown activation {name}')


class ConvModule(nn.Module):
    """conv(bias-free) + BN + act.

    Padding defaults to kernel_size // 2 ("same" for odd kernels), matching
    the reference Conv brick (darknetcsp.py:32).
    """
    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    act: Optional[Union[str, dict]] = 'Mish'
    use_norm: bool = True
    use_bias: bool = False
    bn_eps: float = BN_EPS
    bn_momentum: float = BN_MOMENTUM
    dtype: Any = None  # computation dtype (None -> infer from input)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
            name='conv')(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name='bn')(x)
        act_fn = get_activation(self.act)
        if act_fn is not None:
            x = act_fn(x)
        return x


class Conv2d(nn.Module):
    """Raw bias-free 1x1-style conv (the ``nn.Conv2d`` legs of CSP blocks,
    reference darknetcsp.py:83-85,127-128,198)."""
    features: int
    kernel_size: int = 1
    stride: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
            name='conv')(x)


class BatchNormAct(nn.Module):
    """Shared BN + activation applied to concatenated CSP branches
    (reference darknetcsp.py:88-95)."""
    act: Optional[Union[str, dict]] = 'Mish'
    bn_eps: float = BN_EPS
    bn_momentum: float = BN_MOMENTUM
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name='bn')(x)
        act_fn = get_activation(self.act)
        return act_fn(x) if act_fn is not None else x


def max_pool_same(x, kernel_size: int):
    """stride-1 max pool with same padding (SPP legs, darknetcsp.py:173-176).

    Separable form: max over a k x k window == max over rows then
    columns (bit-identical for square windows). This cuts the compares
    from k^2 to 2k and, more importantly, the BACKWARD pass becomes two
    1-D ``select_and_scatter`` ops instead of one k^2-window one —
    profiled at 10ms/step (8.5%) of the yolov4-l train step for the
    5/9/13 SPP pools before this change."""
    pad = kernel_size // 2
    x = nn.max_pool(x, (kernel_size, 1), strides=(1, 1),
                    padding=[(pad, pad), (0, 0)])
    return nn.max_pool(x, (1, kernel_size), strides=(1, 1),
                       padding=[(0, 0), (pad, pad)])


def upsample_nearest_2x(x):
    """NHWC nearest-neighbor 2x upsample (neck top-down path,
    yolo_neck_csp.py:214). Implemented as reshape+broadcast — XLA lowers
    this to a cheap layout op, no gather."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
