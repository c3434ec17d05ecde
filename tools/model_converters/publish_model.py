#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))
"""Publish a checkpoint: strip training state down to inference weights
and stamp the filename with a content hash
(reference tools/model_converters/publish_model.py: delete optimizer,
append sha256[:8]).

Accepts either an msgpack weights file (re-published with hash) or an
orbax train-state directory (extracts EMA params + EMA batch stats —
the weights eval uses, apis/train.py evaluate_ema)."""
import argparse
import hashlib
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description='Publish a model checkpoint')
    p.add_argument('in_file', help='msgpack weights OR orbax ckpt dir')
    p.add_argument('out_file', help='output msgpack path (hash appended)')
    p.add_argument('--use-ema', action='store_true', default=True,
                   help='publish EMA weights from a train state (default)')
    p.add_argument('--raw', dest='use_ema', action='store_false',
                   help='publish the online (non-EMA) weights')
    return p.parse_args()


def main():
    args = parse_args()
    from tpudet.utils.checkpoint import (load_train_state_raw,
                                         load_variables, save_variables)

    if osp.isdir(args.in_file):
        state = load_train_state_raw(args.in_file)
        if args.use_ema:
            variables = {'params': state['ema_params'],
                         'batch_stats': state.get('ema_batch_stats', {})}
        else:
            variables = {'params': state['params'],
                         'batch_stats': state.get('batch_stats', {})}
        meta = {'published_from': args.in_file,
                'ema': bool(args.use_ema)}
    else:
        variables, meta = load_variables(args.in_file)
        meta = dict(meta, published_from=args.in_file)

    tmp = args.out_file
    save_variables(tmp, variables, meta)
    with open(tmp, 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    root, ext = osp.splitext(tmp)
    final = f'{root}-{sha[:8]}{ext or ".msgpack"}'
    import os
    os.replace(tmp, final)
    print(f'published: {final}')
    return final


if __name__ == '__main__':
    main()
