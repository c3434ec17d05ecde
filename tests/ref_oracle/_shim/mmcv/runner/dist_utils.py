def get_dist_info():
    return 0, 1


def init_dist(launcher, backend='nccl', **kwargs):
    raise NotImplementedError('shim is single-process')


def master_only(func):
    return func


def allreduce_grads(params, coalesce=True, bucket_size_mb=-1):
    pass


def allreduce_params(params, coalesce=True, bucket_size_mb=-1):
    pass
