#!/usr/bin/env python
"""Train a detector from a config file (reference tools/train.py analogue).

No --launcher flag: multi-host runs call jax.distributed.initialize via
--coordinator/--num-processes/--process-id (or rely on TPU auto-detection),
and the same script is simply started once per host.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', help='dir to save logs and checkpoints')
    p.add_argument('--max-steps', type=int, default=None,
                   help='hard cap on optimizer steps (debug)')
    p.add_argument('--no-resume', action='store_true',
                   help='do not auto-resume from latest checkpoint')
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--coordinator', default=None,
                   help='jax.distributed coordinator address (multi-host)')
    p.add_argument('--num-processes', type=int, default=None)
    p.add_argument('--process-id', type=int, default=None)
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='override config entries, key=value dotted keys')
    return p.parse_args()


def main():
    args = parse_args()

    from tpudet.apis.train import train_detector
    from tpudet.config import Config
    from tpudet.parallel.mesh import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        overrides = {}
        for kv in args.cfg_options:
            k, v = kv.split('=', 1)
            try:
                import ast
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            overrides[k] = v
        cfg.merge_from_dict(overrides)
    if args.seed is not None:
        cfg['seed'] = args.seed

    work_dir = args.work_dir or osp.join(
        'work_dirs', osp.splitext(osp.basename(args.config))[0])
    import os
    os.makedirs(work_dir, exist_ok=True)
    train_detector(cfg, work_dir, max_steps=args.max_steps,
                   resume=not args.no_resume)


if __name__ == '__main__':
    main()
