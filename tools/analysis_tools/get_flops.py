#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Model FLOPs/params report (reference tools/analysis_tools/get_flops.py
analogue) — uses XLA's own cost analysis of the compiled forward, which is
exact for the program that actually runs."""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs='+', default=[640, 640])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpudet.config import Config
    from tpudet.models.builder import build_detector

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg['model'])
    h, w = (args.shape * 2)[:2]
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    n_params = sum(x.size for x in jax.tree.leaves(variables['params']))
    lowered = jax.jit(model.apply).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (XLA cost analysis): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
