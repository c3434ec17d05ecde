from .transformer import (DetrTransformer, SinePositionalEncoding,
                          sine_positional_encoding)

__all__ = ['DetrTransformer', 'SinePositionalEncoding',
           'sine_positional_encoding']
