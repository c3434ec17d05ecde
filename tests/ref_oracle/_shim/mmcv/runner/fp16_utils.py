import functools


def _identity_decorator(*dargs, **dkwargs):
    """force_fp32 / auto_fp16 are no-ops on CPU fp32 oracle runs."""
    if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
        return dargs[0]

    def wrapper(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            return fn(*args, **kwargs)
        return inner
    return wrapper


force_fp32 = _identity_decorator
auto_fp16 = _identity_decorator


def cast_tensor_type(inputs, src_type, dst_type):
    return inputs


def wrap_fp16_model(model):
    pass
