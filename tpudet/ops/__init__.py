from .mish import mish, mish_pallas, mish_reference

__all__ = ['mish', 'mish_pallas', 'mish_reference']
