#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Dump the fully-resolved config (reference tools/misc/print_config.py)."""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()

    from tpudet.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        import ast
        overrides = {}
        for kv in args.cfg_options:
            k, v = kv.split('=', 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            overrides[k] = v
        cfg.merge_from_dict(overrides)
    print(cfg.dump())


if __name__ == '__main__':
    main()
