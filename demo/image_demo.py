#!/usr/bin/env python
"""Single-image detection demo (reference demo/image_demo.py analogue)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img', help='image file')
    p.add_argument('config', help='config file')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--with-masks', action='store_true',
                   help='predict + draw instance masks (mask-capable '
                        'models: Mask R-CNN family, SCNet, PointRend, '
                        'YOLACT)')
    p.add_argument('--out-file', default=None,
                   help='save visualization to file')
    args = p.parse_args()

    from tpudet.apis.inference import inference_detector, init_detector
    from tpudet.visualization import imshow_det_bboxes

    det = init_detector(args.config, args.checkpoint)
    result = inference_detector(det, args.img, with_masks=args.with_masks)
    bbox_result = result[0] if args.with_masks else result
    kept = 0
    for cls, arr in enumerate(bbox_result):
        for box in arr:
            if box[4] >= args.score_thr:
                print(f'{det.CLASSES[cls]}: score={box[4]:.3f} '
                      f'box=({box[0]:.1f},{box[1]:.1f},{box[2]:.1f},'
                      f'{box[3]:.1f})')
                kept += 1
    print(f'{kept} detections above {args.score_thr}')
    if args.out_file:
        imshow_det_bboxes(args.img, result, det.CLASSES,
                          score_thr=args.score_thr, out_file=args.out_file)


if __name__ == '__main__':
    main()
