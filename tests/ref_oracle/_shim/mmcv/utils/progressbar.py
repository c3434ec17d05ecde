"""Serial progress helpers (shim) — no actual progress bars."""


class ProgressBar:
    def __init__(self, task_num=0, bar_width=50, start=True, file=None):
        self.task_num = task_num

    def start(self):
        pass

    def update(self, num_tasks=1):
        pass


def track_progress(func, tasks, bar_width=50, file=None, **kwargs):
    return [func(t) for t in tasks]


def track_iter_progress(tasks, bar_width=50, file=None):
    yield from tasks


def track_parallel_progress(func, tasks, nproc, initializer=None,
                            initargs=None, bar_width=50, chunksize=1,
                            skip_first=False, keep_order=True, file=None):
    # serial execution is fine for oracle-scale workloads
    return [func(t) for t in tasks]
