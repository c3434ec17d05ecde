import torch


class DataContainer:
    def __init__(self, data, stack=False, padding_value=0, cpu_only=False,
                 pad_dims=2):
        self._data = data
        self._stack = stack
        self._padding_value = padding_value
        self._cpu_only = cpu_only
        self._pad_dims = pad_dims

    @property
    def data(self):
        return self._data

    @property
    def datatype(self):
        if isinstance(self._data, torch.Tensor):
            return self._data.type()
        return type(self._data)

    @property
    def cpu_only(self):
        return self._cpu_only

    @property
    def stack(self):
        return self._stack

    @property
    def padding_value(self):
        return self._padding_value

    @property
    def pad_dims(self):
        return self._pad_dims

    def size(self, *args, **kwargs):
        return self._data.size(*args, **kwargs)

    def dim(self):
        return self._data.dim()

    def __repr__(self):
        return f'DataContainer({self._data!r})'


def collate(batch, samples_per_gpu=1):
    raise NotImplementedError('shim collate unused')


def scatter(inputs, target_gpus, dim=0):
    raise NotImplementedError('shim scatter unused')


def is_module_wrapper(module):
    return False


class MMDataParallel:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('shim has no data parallel')


class MMDistributedDataParallel(MMDataParallel):
    pass
