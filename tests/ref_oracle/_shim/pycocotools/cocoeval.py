class COCOeval:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            'COCOeval shim stub — use fast-bbox / eval_map oracles instead')
