#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Training-log analysis (reference tools/analysis_tools/analyze_logs.py
analogue): parse tpudet train.log lines, report per-key curves / epoch
timing statistics."""
import argparse
import re
from collections import defaultdict

LINE = re.compile(
    r'epoch (\d+) step (\d+)/(\d+) loss ([\d.]+) \(cls ([\d.]+) '
    r'conf ([\d.]+) bbox ([\d.]+)\) lr ([\d.e-]+) gnorm ([\d.]+) '
    r'img/s ([\d.]+)')


def parse(path):
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rows.append(dict(
                    epoch=int(m.group(1)), step=int(m.group(2)),
                    loss=float(m.group(4)), loss_cls=float(m.group(5)),
                    loss_conf=float(m.group(6)), loss_bbox=float(m.group(7)),
                    lr=float(m.group(8)), grad_norm=float(m.group(9)),
                    img_s=float(m.group(10))))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument('logs', nargs='+')
    p.add_argument('--keys', nargs='+', default=['loss'])
    p.add_argument('--plot', help='save a matplotlib png')
    args = p.parse_args()

    for path in args.logs:
        rows = parse(path)
        if not rows:
            print(f'{path}: no parsable train lines')
            continue
        print(f'{path}: {len(rows)} points, epochs '
              f'{rows[0]["epoch"]}..{rows[-1]["epoch"]}')
        for k in args.keys:
            vals = [r[k] for r in rows]
            print(f'  {k}: first={vals[0]:.4f} last={vals[-1]:.4f} '
                  f'min={min(vals):.4f} max={max(vals):.4f}')
        tput = [r['img_s'] for r in rows]
        print(f'  throughput img/s: mean={sum(tput) / len(tput):.1f}')
        if args.plot:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            steps = [r['step'] for r in rows]
            for k in args.keys:
                plt.plot(steps, [r[k] for r in rows], label=k)
            plt.xlabel('step')
            plt.legend()
            plt.savefig(args.plot)
            print(f'  saved plot to {args.plot}')


if __name__ == '__main__':
    main()
