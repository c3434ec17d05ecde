from .darknet_csp import (DarknetCSP, Bottleneck, BottleneckCSP,
                          BottleneckCSP2, SPPV4, SPPV5, Focus)

__all__ = [
    'DarknetCSP', 'Bottleneck', 'BottleneckCSP', 'BottleneckCSP2', 'SPPV4',
    'SPPV5', 'Focus'
]
