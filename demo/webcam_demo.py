#!/usr/bin/env python
"""Webcam detection demo (reference demo/webcam_demo.py analogue)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--camera-id', type=int, default=0)
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import cv2

    from tpudet.apis.inference import inference_detector, init_detector
    from tpudet.visualization import imshow_det_bboxes

    det = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    assert cap.isOpened(), f'cannot open camera {args.camera_id}'
    print('press ESC to exit')
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(det, frame)
        vis = imshow_det_bboxes(frame, result, det.CLASSES,
                                score_thr=args.score_thr)
        cv2.imshow('webcam', vis)
        if cv2.waitKey(1) & 0xFF == 27:
            break
    cap.release()


if __name__ == '__main__':
    main()
