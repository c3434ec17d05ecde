#!/usr/bin/env python
"""Aggregate robustness results (reference tools/analysis_tools/
robustness_eval.py): prints per-corruption mAP, mPC (mean over
corruptions and severities 1..5) and rPC (mPC / clean performance)."""
import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('results', help='json from test_robustness.py')
    p.add_argument('--metric', default='bbox_mAP')
    args = p.parse_args()

    with open(args.results) as f:
        results = json.load(f)

    clean = None
    per_corruption = {}
    for corruption, by_sev in results.items():
        if '0' in by_sev or 0 in by_sev:
            clean = by_sev.get('0', by_sev.get(0))[args.metric]
        sev_scores = [v[args.metric] for k, v in by_sev.items()
                      if int(k) > 0]
        if sev_scores:
            per_corruption[corruption] = float(np.mean(sev_scores))

    print(f'clean {args.metric}: {clean}')
    for c, v in sorted(per_corruption.items()):
        print(f'  {c:20s} {v:.4f}')
    if per_corruption:
        mpc = float(np.mean(list(per_corruption.values())))
        print(f'mPC: {mpc:.4f}')
        if clean:
            print(f'rPC: {mpc / clean:.4f}')


if __name__ == '__main__':
    main()
