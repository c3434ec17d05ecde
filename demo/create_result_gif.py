#!/usr/bin/env python
"""Stitch result images (e.g. from tools/analysis_tools/analyze_results.py)
into an animated GIF (reference demo/create_result_gif.py analogue;
imageio/matplotlib replaced by PIL, which this environment ships)."""
import argparse
import glob
import os.path as osp


def parse_args():
    p = argparse.ArgumentParser(description='Create a GIF from result images')
    p.add_argument('image_dir',
                   help='directory of drawn result images '
                        '(analyze_results.py --show-dir output, or any '
                        'directory of same-size images)')
    p.add_argument('--out', default='result.gif')
    p.add_argument('--duration-ms', type=int, default=500,
                   help='per-frame duration')
    p.add_argument('--pattern', default='*.jpg',
                   help='glob for frames (sorted by name)')
    return p.parse_args()


def main():
    from PIL import Image

    args = parse_args()
    paths = sorted(glob.glob(osp.join(args.image_dir, args.pattern)))
    if not paths:
        raise SystemExit(f'no images matching {args.pattern} in '
                         f'{args.image_dir}')
    # stream frames: decode lazily via a generator so long high-res
    # sequences never hold every decoded frame in memory at once (PIL
    # consumes append_images iteratively during save)
    first = Image.open(paths[0]).convert('P', palette=Image.ADAPTIVE)
    rest = (Image.open(p).convert('P', palette=Image.ADAPTIVE)
            for p in paths[1:])
    first.save(args.out, save_all=True, append_images=rest,
               duration=args.duration_ms, loop=0)
    print(f'wrote {len(paths)} frames to {args.out}')


if __name__ == '__main__':
    main()
