"""TridentResNet backbone (reference
mmdet/models/backbones/trident_resnet.py).

Scale-aware trident blocks in the final stage: the 3x3 conv of each
bottleneck runs as three weight-shared branches with dilations (1, 2, 3)
(TridentConv, trident_resnet.py:13-89); the first trident block replicates
the single-branch input, and the last concatenates the branches along the
batch axis (concat_output, :101-160) so downstream heads see a 3x batch.
Weight sharing falls out of flax module reuse — the same conv module is
applied to every branch.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from .resnet import Bottleneck, bn, conv

ARCH_SETTINGS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


@BACKBONES.register_module()
class TridentResNet(nn.Module):
    depth: int = 50
    num_branch: int = 3
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem + stages 1..3 are plain ResNet (trident replaces the last)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name='conv1')(x)
        x = nn.relu(bn(train, self.dtype, 'bn1')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        blocks = ARCH_SETTINGS[self.depth][:3]
        planes = 64
        for stage, n in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = Bottleneck(planes, stride=stride if i == 0 else 1,
                               downsample=(i == 0), dtype=self.dtype,
                               name=f'layer{stage + 1}_{i}')(x, train)
            planes *= 2

        # trident stage: weight-shared blocks, one dilation per branch
        n_last = ARCH_SETTINGS[self.depth][3]
        planes = 512
        branches = [x] * self.num_branch
        for i in range(n_last):
            stride = 2 if i == 0 else 1
            conv1 = conv(planes, 1, 1, self.dtype, f'trident{i}_conv1')
            bn1 = bn(train, self.dtype, f'trident{i}_bn1')
            conv2_kernel = self.param(
                f'trident{i}_conv2_kernel', nn.initializers.he_normal(),
                (3, 3, planes, planes))
            bn2 = bn(train, self.dtype, f'trident{i}_bn2')
            conv3 = conv(planes * 4, 1, 1, self.dtype, f'trident{i}_conv3')
            bn3 = bn(train, self.dtype, f'trident{i}_bn3')
            ds_conv = (conv(planes * 4, 1, stride, self.dtype,
                            f'trident{i}_ds_conv') if i == 0 else None)
            ds_bn = (bn(train, self.dtype, f'trident{i}_ds_bn')
                     if i == 0 else None)

            new_branches = []
            for bi, v in enumerate(branches):
                d = self.trident_dilations[bi]
                identity = v
                out = nn.relu(bn1(conv1(v)))
                out = jax.lax.conv_general_dilated(
                    out.astype(conv2_kernel.dtype), conv2_kernel,
                    (stride, stride), [(d, d), (d, d)],
                    rhs_dilation=(d, d),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                out = nn.relu(bn2(out))
                out = bn3(conv3(out))
                if ds_conv is not None:
                    identity = ds_bn(ds_conv(v))
                new_branches.append(nn.relu(out + identity))
            branches = new_branches

        if train or self.test_branch_idx == -1:
            # concat branches along batch (trident_resnet.py concat_output)
            return (jnp.concatenate(branches, axis=0),)
        return (branches[self.test_branch_idx],)
