#!/usr/bin/env python
"""Video detection demo (reference demo/video_demo.py analogue): run the
detector frame by frame, write an annotated video (or show)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video', help='video file')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--out', default=None, help='output video file')
    p.add_argument('--show', action='store_true')
    p.add_argument('--wait-time', type=float, default=1)
    args = p.parse_args()

    import cv2
    import numpy as np

    from tpudet.apis.inference import inference_detector, init_detector
    from tpudet.visualization import imshow_det_bboxes

    det = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), f'cannot open {args.video}'
    writer = None
    if args.out:
        fourcc = cv2.VideoWriter_fourcc(*'mp4v')
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(args.out, fourcc, fps, (w, h))

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(det, frame)
        vis = imshow_det_bboxes(frame, result, det.CLASSES,
                                score_thr=args.score_thr)
        if writer is not None:
            writer.write(vis)
        if args.show:
            cv2.imshow('video', vis)
            if cv2.waitKey(int(args.wait_time)) & 0xFF == 27:
                break
        n += 1
    cap.release()
    if writer is not None:
        writer.release()
        print(f'wrote {n} annotated frames to {args.out}')


if __name__ == '__main__':
    main()
