from .darknet_csp import (DarknetCSP, Bottleneck, BottleneckCSP,
                          BottleneckCSP2, SPPV4, SPPV5, Focus)
from .resnet import ResNet
from .darknet import Darknet
from .ssd_vgg import SSDVGG
from .resnet import ResNeXt, Res2Net
from .regnet import RegNet
from .hourglass import HourglassNet
from .hrnet import HRNet
from .resnest import ResNeSt
from .trident_resnet import TridentResNet
from .detectors_resnet import DetectoRSResNet, DetectoRSResNeXt

__all__ = [
    'DarknetCSP', 'Bottleneck', 'BottleneckCSP', 'BottleneckCSP2', 'SPPV4',
    'SPPV5', 'Focus', 'ResNet', 'ResNeXt', 'Darknet', 'SSDVGG', 'RegNet',
    'Res2Net', 'HourglassNet', 'HRNet', 'ResNeSt', 'TridentResNet',
    'DetectoRSResNet', 'DetectoRSResNeXt'
]
