"""Public inference surface: init_detector / inference_detector /
save+load weights round trip (reference apis/inference.py contract)."""
import os.path as osp

import cv2
import numpy as np
import pytest


@pytest.fixture(scope='module')
def demo_image(tmp_path_factory):
    d = tmp_path_factory.mktemp('demo')
    img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    path = str(d / 'demo.jpg')
    cv2.imwrite(path, img)
    return path


def small_cfg():
    from tpudet.config import Config
    img_norm = dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)
    return Config(dict(
        model=dict(
            type='SingleStageDetector',
            backbone=dict(type='DarknetCSP', scale='v4s5p',
                          out_indices=[3, 4, 5]),
            neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                      out_channels=[64, 64, 64], csp_repetition=1),
            bbox_head=dict(type='YOLOCSPHead', num_classes=3,
                           in_channels=[64, 64, 64]),
            test_cfg=dict(nms_pre=256, score_thr=0.001,
                          nms=dict(type='nms', iou_threshold=0.65),
                          max_per_img=10)),
        data=dict(test=dict(pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
                 transforms=[
                     dict(type='Resize', keep_ratio=True),
                     dict(type='RandomFlip'),
                     dict(type='Pad', size_divisor=32),
                     dict(type='Normalize', **img_norm),
                 ])]))))


def test_init_and_inference_detector(demo_image, tmp_path):
    from tpudet.apis.inference import inference_detector, init_detector
    from tpudet.utils.checkpoint import save_variables

    classes = ('a', 'b', 'c')
    det = init_detector(small_cfg(), classes=classes)
    result = inference_detector(det, demo_image, pad_to=64)
    assert len(result) == 3  # per-class list
    for arr in result:
        assert arr.ndim == 2 and arr.shape[1] == 5

    # ndarray input path
    img = cv2.imread(demo_image)
    result2 = inference_detector(det, img, pad_to=64)
    assert len(result2) == 3

    # weights round trip: save, reload, identical outputs
    ckpt = str(tmp_path / 'w.msgpack')
    save_variables(ckpt, det.variables, meta=dict(CLASSES=list(classes)))
    det2 = init_detector(small_cfg(), checkpoint=ckpt)
    assert det2.CLASSES == classes
    r1 = inference_detector(det, demo_image, pad_to=64)
    r2 = inference_detector(det2, demo_image, pad_to=64)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_async_inference(demo_image):
    import asyncio

    from tpudet.apis.inference import async_inference_detector, init_detector
    det = init_detector(small_cfg(), classes=('a', 'b', 'c'))
    result = asyncio.run(async_inference_detector(det, demo_image,
                                                  pad_to=64))
    assert len(result) == 3
