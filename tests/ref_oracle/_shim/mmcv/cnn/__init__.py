import torch.nn as nn

from ..utils import Registry
from .bricks import (ACTIVATION_LAYERS, CONV_LAYERS, NORM_LAYERS,  # noqa
                     PADDING_LAYERS, PLUGIN_LAYERS, UPSAMPLE_LAYERS,
                     ContextBlock, ConvModule, ConvWS2d,
                     DepthwiseSeparableConvModule, GeneralizedAttention,
                     HSigmoid, HSwish, NonLocal2d, Scale, Swish,
                     bias_init_with_prob, build_activation_layer,
                     build_conv_layer, build_norm_layer, build_padding_layer,
                     build_plugin_layer, build_upsample_layer,
                     caffe2_xavier_init, constant_init, is_norm, kaiming_init,
                     normal_init, trunc_normal_init, uniform_init,
                     xavier_init)

MODELS = Registry('model')

Conv2d = nn.Conv2d
Conv = nn.Conv2d
ConvTranspose2d = nn.ConvTranspose2d
MaxPool2d = nn.MaxPool2d
Linear = nn.Linear


def make_vgg_layer(inplanes, planes, num_blocks, dilation=1, with_bn=False,
                   ceil_mode=False):
    layers = []
    for _ in range(num_blocks):
        layers.append(nn.Conv2d(inplanes, planes, 3, padding=dilation,
                                dilation=dilation))
        if with_bn:
            layers.append(nn.BatchNorm2d(planes))
        layers.append(nn.ReLU(inplace=True))
        inplanes = planes
    layers.append(nn.MaxPool2d(kernel_size=2, stride=2, ceil_mode=ceil_mode))
    return layers


class VGG(nn.Module):
    """Minimal functional VGG matching mmcv's layout (for SSD-VGG)."""

    arch_settings = {
        11: (1, 1, 2, 2, 2),
        13: (2, 2, 2, 2, 2),
        16: (2, 2, 3, 3, 3),
        19: (2, 2, 4, 4, 4),
    }

    def __init__(self, depth, with_bn=False, num_classes=-1, num_stages=5,
                 dilations=(1, 1, 1, 1, 1), out_indices=(0, 1, 2, 3, 4),
                 frozen_stages=-1, bn_eval=True, bn_frozen=False,
                 ceil_mode=False, with_last_pool=True):
        super().__init__()
        stage_blocks = self.arch_settings[depth][:num_stages]
        self.num_classes = num_classes
        self.out_indices = out_indices
        self.frozen_stages = frozen_stages
        self.bn_eval = bn_eval
        self.bn_frozen = bn_frozen
        self.inplanes = 3
        start_idx = 0
        vgg_layers = []
        self.range_sub_modules = []
        for i, num_blocks in enumerate(stage_blocks):
            num_modules = num_blocks * (2 + with_bn) + 1
            end_idx = start_idx + num_modules
            dilation = dilations[i]
            planes = 64 * 2**i if i < 4 else 512
            vgg_layer = make_vgg_layer(self.inplanes, planes, num_blocks,
                                       dilation=dilation, with_bn=with_bn,
                                       ceil_mode=ceil_mode)
            vgg_layers.extend(vgg_layer)
            self.inplanes = planes
            self.range_sub_modules.append([start_idx, end_idx])
            start_idx = end_idx
        if not with_last_pool:
            vgg_layers.pop(-1)
            self.range_sub_modules[-1][1] -= 1
        self.module_name = 'features'
        self.add_module(self.module_name, nn.Sequential(*vgg_layers))
        if self.num_classes > 0:
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, num_classes))

    def init_weights(self, pretrained=None):
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                kaiming_init(m)
            elif isinstance(m, nn.BatchNorm2d):
                constant_init(m, 1)
            elif isinstance(m, nn.Linear):
                normal_init(m, std=0.01)

    def forward(self, x):
        outs = []
        vgg_layers = getattr(self, self.module_name)
        for i in range(len(self.range_sub_modules)):
            for j in range(*self.range_sub_modules[i]):
                vgg_layer = vgg_layers[j]
                x = vgg_layer(x)
            if i in self.out_indices:
                outs.append(x)
        if self.num_classes > 0:
            x = x.view(x.size(0), -1)
            x = self.classifier(x)
            outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)

    def train(self, mode=True):
        super().train(mode)
        return self


def fuse_conv_bn(module):
    return module
