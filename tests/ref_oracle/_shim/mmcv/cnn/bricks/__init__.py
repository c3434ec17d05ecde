import torch
import torch.nn as nn
import torch.nn.functional as F

from .registry import (ACTIVATION_LAYERS, CONV_LAYERS, DROPOUT_LAYERS,
                       NORM_LAYERS, PADDING_LAYERS, PLUGIN_LAYERS,
                       UPSAMPLE_LAYERS)

# ---------------------------------------------------------------- layers
for _cls in (nn.ReLU, nn.LeakyReLU, nn.PReLU, nn.RReLU, nn.ReLU6, nn.ELU,
             nn.Sigmoid, nn.Tanh, nn.GELU):
    ACTIVATION_LAYERS.register_module(module=_cls)


@ACTIVATION_LAYERS.register_module()
class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


@ACTIVATION_LAYERS.register_module()
class HSigmoid(nn.Module):
    def __init__(self, bias=1.0, divisor=2.0, min_value=0.0, max_value=1.0):
        super().__init__()
        self.bias, self.divisor = bias, divisor
        self.min_value, self.max_value = min_value, max_value

    def forward(self, x):
        return ((x + self.bias) / self.divisor).clamp_(
            self.min_value, self.max_value)


@ACTIVATION_LAYERS.register_module()
class HSwish(nn.Module):
    def __init__(self, inplace=False):
        super().__init__()
        self.act = nn.ReLU6(inplace)

    def forward(self, x):
        return x * self.act(x + 3) / 6


NORM_LAYERS.register_module('BN', module=nn.BatchNorm2d)
NORM_LAYERS.register_module('BN1d', module=nn.BatchNorm1d)
NORM_LAYERS.register_module('BN2d', module=nn.BatchNorm2d)
NORM_LAYERS.register_module('BN3d', module=nn.BatchNorm3d)
NORM_LAYERS.register_module('SyncBN', module=nn.BatchNorm2d)  # single-proc
NORM_LAYERS.register_module('GN', module=nn.GroupNorm)
NORM_LAYERS.register_module('LN', module=nn.LayerNorm)
NORM_LAYERS.register_module('IN', module=nn.InstanceNorm2d)

CONV_LAYERS.register_module('Conv1d', module=nn.Conv1d)
CONV_LAYERS.register_module('Conv2d', module=nn.Conv2d)
CONV_LAYERS.register_module('Conv3d', module=nn.Conv3d)
CONV_LAYERS.register_module('Conv', module=nn.Conv2d)

PADDING_LAYERS.register_module('zero', module=nn.ZeroPad2d)
PADDING_LAYERS.register_module('reflect', module=nn.ReflectionPad2d)
PADDING_LAYERS.register_module('replicate', module=nn.ReplicationPad2d)

UPSAMPLE_LAYERS.register_module('deconv', module=nn.ConvTranspose2d)
UPSAMPLE_LAYERS.register_module('pixel_shuffle', module=nn.PixelShuffle)


@UPSAMPLE_LAYERS.register_module('nearest')
@UPSAMPLE_LAYERS.register_module('bilinear')
class _Upsample(nn.Upsample):
    pass


@CONV_LAYERS.register_module('ConvWS')
class ConvWS2d(nn.Conv2d):
    """Weight-standardized conv (Qiao et al.) — gn+ws family."""

    def __init__(self, *args, eps=1e-5, **kwargs):
        super().__init__(*args, **kwargs)
        self.eps = eps

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=[1, 2, 3], keepdim=True)
        std = w.flatten(1).std(dim=1).reshape(-1, 1, 1, 1)
        w = (w - mean) / (std + self.eps)
        return F.conv2d(x, w, self.bias, self.stride, self.padding,
                        self.dilation, self.groups)


@PLUGIN_LAYERS.register_module()
class ContextBlock(nn.Module):
    """GCNet context block (functional)."""

    def __init__(self, in_channels, ratio, pooling_type='att',
                 fusion_types=('channel_add', )):
        super().__init__()
        self.in_channels = in_channels
        self.ratio = ratio
        self.planes = int(in_channels * ratio)
        self.pooling_type = pooling_type
        self.fusion_types = fusion_types
        if pooling_type == 'att':
            self.conv_mask = nn.Conv2d(in_channels, 1, kernel_size=1)
            self.softmax = nn.Softmax(dim=2)
        else:
            self.avg_pool = nn.AdaptiveAvgPool2d(1)
        if 'channel_add' in fusion_types:
            self.channel_add_conv = nn.Sequential(
                nn.Conv2d(self.in_channels, self.planes, kernel_size=1),
                nn.LayerNorm([self.planes, 1, 1]),
                nn.ReLU(inplace=True),
                nn.Conv2d(self.planes, self.in_channels, kernel_size=1))
        else:
            self.channel_add_conv = None
        if 'channel_mul' in fusion_types:
            self.channel_mul_conv = nn.Sequential(
                nn.Conv2d(self.in_channels, self.planes, kernel_size=1),
                nn.LayerNorm([self.planes, 1, 1]),
                nn.ReLU(inplace=True),
                nn.Conv2d(self.planes, self.in_channels, kernel_size=1))
        else:
            self.channel_mul_conv = None

    def spatial_pool(self, x):
        batch, channel, height, width = x.size()
        if self.pooling_type == 'att':
            input_x = x.view(batch, channel, height * width).unsqueeze(1)
            context_mask = self.conv_mask(x).view(batch, 1, height * width)
            context_mask = self.softmax(context_mask).unsqueeze(-1)
            context = torch.matmul(input_x, context_mask)
            context = context.view(batch, channel, 1, 1)
        else:
            context = self.avg_pool(x)
        return context

    def forward(self, x):
        context = self.spatial_pool(x)
        out = x
        if self.channel_mul_conv is not None:
            out = out * torch.sigmoid(self.channel_mul_conv(context))
        if self.channel_add_conv is not None:
            out = out + self.channel_add_conv(context)
        return out


@PLUGIN_LAYERS.register_module()
class GeneralizedAttention(nn.Module):
    """Placeholder — import-time only; raise if executed."""

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, x):
        raise NotImplementedError('GeneralizedAttention shim is import-only')


@PLUGIN_LAYERS.register_module()
class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (functional, default cfg)."""

    def __init__(self, in_channels, reduction=2, use_scale=True,
                 conv_cfg=None, norm_cfg=None, mode='embedded_gaussian',
                 **kwargs):
        super().__init__()
        self.in_channels = in_channels
        self.inter_channels = max(in_channels // reduction, 1)
        self.use_scale = use_scale
        self.mode = mode
        self.g = nn.Conv2d(in_channels, self.inter_channels, 1)
        self.theta = nn.Conv2d(in_channels, self.inter_channels, 1)
        self.phi = nn.Conv2d(in_channels, self.inter_channels, 1)
        from . import ConvModule  # late import to avoid cycle
        self.conv_out = ConvModule(self.inter_channels, in_channels, 1,
                                   norm_cfg=norm_cfg, act_cfg=None)

    def forward(self, x):
        n, _, h, w = x.shape
        g_x = self.g(x).view(n, self.inter_channels, -1).permute(0, 2, 1)
        theta_x = self.theta(x).view(n, self.inter_channels, -1)
        theta_x = theta_x.permute(0, 2, 1)
        phi_x = self.phi(x).view(n, self.inter_channels, -1)
        pairwise = torch.matmul(theta_x, phi_x)
        if self.use_scale:
            pairwise = pairwise / theta_x.shape[-1]**0.5
        pairwise = pairwise.softmax(dim=-1)
        y = torch.matmul(pairwise, g_x).permute(0, 2, 1).reshape(
            n, self.inter_channels, h, w)
        return x + self.conv_out(y)


# ---------------------------------------------------------------- builders
def build_activation_layer(cfg):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = ACTIVATION_LAYERS.get(layer_type)
    if cls is None:
        raise KeyError(f'unknown activation {layer_type}')
    return cls(**cfg_)


_NORM_ABBR = {'BN': 'bn', 'BN1d': 'bn', 'BN2d': 'bn', 'BN3d': 'bn',
              'SyncBN': 'bn', 'GN': 'gn', 'LN': 'ln', 'IN': 'in'}


def build_norm_layer(cfg, num_features, postfix=''):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = NORM_LAYERS.get(layer_type)
    if cls is None:
        raise KeyError(f'unknown norm {layer_type}')
    abbr = _NORM_ABBR.get(layer_type, 'norm')
    name = abbr + str(postfix)
    requires_grad = cfg_.pop('requires_grad', True)
    cfg_.setdefault('eps', 1e-5)
    if layer_type == 'GN':
        layer = cls(num_channels=num_features, **cfg_)
    else:
        layer = cls(num_features, **cfg_)
    for param in layer.parameters():
        param.requires_grad = requires_grad
    return name, layer


def build_conv_layer(cfg, *args, **kwargs):
    if cfg is None:
        cfg_ = dict(type='Conv2d')
    else:
        cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = CONV_LAYERS.get(layer_type)
    if cls is None:
        raise KeyError(f'unknown conv {layer_type}')
    return cls(*args, **kwargs, **cfg_)


def build_padding_layer(cfg, *args, **kwargs):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = PADDING_LAYERS.get(layer_type)
    return cls(*args, **kwargs, **cfg_)


def build_upsample_layer(cfg, *args, **kwargs):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = UPSAMPLE_LAYERS.get(layer_type)
    if cls is None:
        raise KeyError(f'unknown upsample {layer_type}')
    if cls is _Upsample:
        cfg_.setdefault('mode', layer_type)
        return cls(**cfg_, **kwargs)
    return cls(*args, **kwargs, **cfg_)


def build_plugin_layer(cfg, postfix='', **kwargs):
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    cls = PLUGIN_LAYERS.get(layer_type)
    if cls is None:
        raise KeyError(f'unknown plugin {layer_type}')
    abbr = getattr(cls, '_abbr_', cls.__name__.lower())
    name = abbr + str(postfix)
    return name, cls(**kwargs, **cfg_)


def build_dropout(cfg, **kwargs):
    if cfg is None:
        return nn.Identity()
    cfg_ = dict(cfg)
    layer_type = cfg_.pop('type')
    if layer_type in ('Dropout', 'DropOut'):
        return nn.Dropout(cfg_.get('drop_prob', 0.5))
    cls = DROPOUT_LAYERS.get(layer_type)
    if cls is None:
        return nn.Dropout(cfg_.get('drop_prob', 0.5))
    return cls(**kwargs, **cfg_)


@DROPOUT_LAYERS.register_module()
class DropPath(nn.Module):
    def __init__(self, drop_prob=0.1):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0. or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0], ) + (1, ) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        mask.floor_()
        return x.div(keep) * mask


# ---------------------------------------------------------------- ConvModule
class ConvModule(nn.Module):
    """conv + norm + act block matching mmcv semantics/state-dict keys."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias='auto', conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type='ReLU'), inplace=True,
                 with_spectral_norm=False, padding_mode='zeros',
                 order=('conv', 'norm', 'act')):
        super().__init__()
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg
        self.act_cfg = act_cfg
        self.order = tuple(order)
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == 'auto':
            bias = not self.with_norm
        self.with_bias = bias

        self.conv = build_conv_layer(
            conv_cfg, in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias)
        self.in_channels = self.conv.in_channels
        self.out_channels = self.conv.out_channels
        self.kernel_size = self.conv.kernel_size
        self.stride = self.conv.stride
        self.padding = self.conv.padding
        self.dilation = self.conv.dilation
        self.groups = self.conv.groups

        if self.with_norm:
            if order.index('norm') > order.index('conv'):
                norm_channels = out_channels
            else:
                norm_channels = in_channels
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None

        if self.with_activation:
            act_cfg_ = dict(act_cfg)
            if act_cfg_['type'] not in ('Tanh', 'PReLU', 'Sigmoid', 'HSigmoid',
                                        'Swish', 'GELU', 'Mish'):
                act_cfg_.setdefault('inplace', inplace)
            self.activate = build_activation_layer(act_cfg_)

        self.init_weights()

    @property
    def norm(self):
        if self.norm_name:
            return getattr(self, self.norm_name)
        return None

    def init_weights(self):
        if not hasattr(self.conv, 'init_weights'):
            if self.with_activation and self.act_cfg['type'] == 'LeakyReLU':
                nonlinearity = 'leaky_relu'
                a = self.act_cfg.get('negative_slope', 0.01)
            else:
                nonlinearity = 'relu'
                a = 0
            kaiming_init(self.conv, a=a, nonlinearity=nonlinearity)
        if self.with_norm:
            constant_init(self.norm, 1, bias=0)

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == 'conv':
                x = self.conv(x)
            elif layer == 'norm' and norm and self.with_norm:
                x = self.norm(x)
            elif layer == 'act' and activate and self.with_activation:
                x = self.activate(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, norm_cfg=None,
                 act_cfg=dict(type='ReLU'), dw_norm_cfg='default',
                 dw_act_cfg='default', pw_norm_cfg='default',
                 pw_act_cfg='default', **kwargs):
        super().__init__()
        dw_norm_cfg = dw_norm_cfg if dw_norm_cfg != 'default' else norm_cfg
        dw_act_cfg = dw_act_cfg if dw_act_cfg != 'default' else act_cfg
        pw_norm_cfg = pw_norm_cfg if pw_norm_cfg != 'default' else norm_cfg
        pw_act_cfg = pw_act_cfg if pw_act_cfg != 'default' else act_cfg
        self.depthwise_conv = ConvModule(
            in_channels, in_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=in_channels,
            norm_cfg=dw_norm_cfg, act_cfg=dw_act_cfg, **kwargs)
        self.pointwise_conv = ConvModule(
            in_channels, out_channels, 1, norm_cfg=pw_norm_cfg,
            act_cfg=pw_act_cfg, **kwargs)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class Scale(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float))

    def forward(self, x):
        return x * self.scale


# ---------------------------------------------------------------- init utils
def constant_init(module, val, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def trunc_normal_init(module, mean=0, std=1, a=-2, b=2, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.trunc_normal_(module.weight, mean, std, a, b)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def uniform_init(module, a=0, b=1, bias=0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.uniform_(module.weight, a, b)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def xavier_init(module, gain=1, bias=0, distribution='normal'):
    if hasattr(module, 'weight') and module.weight is not None:
        if distribution == 'uniform':
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def kaiming_init(module, a=0, mode='fan_out', nonlinearity='relu', bias=0,
                 distribution='normal'):
    if hasattr(module, 'weight') and module.weight is not None:
        if distribution == 'uniform':
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def caffe2_xavier_init(module, bias=0):
    kaiming_init(module, a=1, mode='fan_in', nonlinearity='leaky_relu',
                 bias=bias, distribution='uniform')


def bias_init_with_prob(prior_prob):
    import numpy as np
    return float(-np.log((1 - prior_prob) / prior_prob))


def is_norm(layer, exclude=None):
    if exclude is not None:
        if not isinstance(exclude, tuple):
            exclude = (exclude, )
        if isinstance(layer, exclude):
            return False
    norm_types = (nn.modules.batchnorm._BatchNorm, nn.GroupNorm,
                  nn.LayerNorm, nn.modules.instancenorm._InstanceNorm)
    return isinstance(layer, norm_types)
