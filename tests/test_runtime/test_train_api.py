"""End-to-end train_detector smoke test on a tiny synthetic COCO dataset:
config -> loader -> jitted train step (8-device mesh) -> checkpoint ->
EMA weights export -> eval path."""
import json
import os.path as osp

import cv2
import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('coco_train')
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(16):
        h, w = 80, 100
        fn = f'img{i}.jpg'
        cv2.imwrite(str(root / fn), (rng.rand(h, w, 3) * 255).astype(
            np.uint8))
        images.append(dict(id=i + 1, file_name=fn, width=w, height=h))
        for _ in range(2):
            bw, bh = int(rng.randint(12, 40)), int(rng.randint(12, 36))
            x = int(rng.randint(0, w - bw))
            y = int(rng.randint(0, h - bh))
            annotations.append(dict(
                id=ann_id, image_id=i + 1,
                bbox=[float(x), float(y), float(bw), float(bh)],
                area=float(bw * bh), iscrowd=0,
                category_id=int(rng.choice([1, 2]))))
            ann_id += 1
    ann = root / 'ann.json'
    with open(ann, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='a'),
                                   dict(id=2, name='b')]), f)
    return str(root), str(ann)


def make_cfg(root, ann):
    from tpudet.config import Config
    img_norm = dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
        dict(type='Pad', size_divisor=32),
        dict(type='Normalize', **img_norm),
    ]
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Normalize', **img_norm),
             ]),
    ]
    return Config(dict(
        model=dict(
            type='SingleStageDetector',
            backbone=dict(type='DarknetCSP', scale='v4s5p',
                          out_indices=[3, 4, 5]),
            neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                      out_channels=[64, 64, 64], csp_repetition=1),
            bbox_head=dict(type='YOLOCSPHead', num_classes=2,
                           in_channels=[64, 64, 64]),
            test_cfg=dict(nms_pre=256, score_thr=0.001,
                          nms=dict(type='nms', iou_threshold=0.65),
                          max_per_img=10)),
        data=dict(
            samples_per_gpu=1,  # x8 devices -> global batch 8
            workers_per_gpu=1,
            train_img_size=64,
            max_gts=8,
            train=dict(type='CocoDataset', ann_file=ann, img_prefix=root,
                       classes=('a', 'b'), pipeline=pipeline),
            val=dict(type='CocoDataset', ann_file=ann, img_prefix=root,
                     classes=('a', 'b'), pipeline=test_pipeline,
                     test_mode=True),
            test=dict(type='CocoDataset', ann_file=ann, img_prefix=root,
                      classes=('a', 'b'), pipeline=test_pipeline,
                      test_mode=True)),
        nominal_batch_size=8,
        optimizer=dict(lr=0.01, momentum=0.9, weight_decay=5e-4,
                       nesterov=True),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(min_lr_ratio=0.2),
        custom_hooks=[
            dict(type='DetailedLinearWarmUpHook', warmup_iters=2),
            dict(type='StateEMAHook', momentum=0.999, warm_up=10),
        ],
        runner=dict(max_epochs=1),
        evaluation=dict(interval=0),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        seed=0))


def test_train_detector_device_aug(tiny_coco_dir, tmp_path):
    """On-device mosaic/affine/HSV training path end-to-end."""
    root, ann = tiny_coco_dir
    cfg = make_cfg(root, ann)
    cfg['data']['device_aug'] = dict(
        pad_to=192, crop=128, scale_limit=0.5, pad_val=114.)
    cfg['data']['train']['pipeline'] = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
    ]
    from tpudet.apis.train import train_detector
    metrics = train_detector(cfg, str(tmp_path), max_steps=2, resume=False)
    assert np.isfinite(metrics['loss'])


def test_train_detector_end_to_end(tiny_coco_dir, tmp_path):
    root, ann = tiny_coco_dir
    cfg = make_cfg(root, ann)
    from tpudet.apis.train import train_detector
    metrics = train_detector(cfg, str(tmp_path), max_steps=2, resume=False)
    assert np.isfinite(metrics['loss'])
    assert osp.exists(str(tmp_path / 'latest_ema.msgpack'))

    # load exported EMA weights and run the eval path
    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    det = init_detector(cfg, str(tmp_path / 'latest_ema.msgpack'))
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    results = single_device_test(det.model, det.variables, dataset,
                                 batch_size=4, img_size=64, progress=False)
    assert len(results) == len(dataset)
    annotations = [dataset.get_ann_info_test(i) for i in range(len(dataset))]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=dataset.CLASSES)
    assert 'map' in report  # untrained model: any finite/nan value is fine


def test_nan_guard_trips_and_dumps(tiny_coco_dir, tmp_path, monkeypatch):
    """The train driver's NaN guard (SURVEY §5 jax_debug_nans analogue)
    must abort with diagnostics instead of training on poisoned grads."""
    import jax
    import tpudet.apis.train as T

    root, ann = tiny_coco_dir
    cfg = make_cfg(root, ann)
    cfg['nan_guard'] = dict(enabled=True, interval=1)

    real_jit = T.jit_train_step

    def poisoned_jit(step_fn, mesh, **kw):
        inner = real_jit(step_fn, mesh, **kw)

        def poisoned(state, batch):
            state, metrics = inner(state, batch)
            metrics = dict(metrics)
            metrics['loss'] = jax.numpy.float32(np.nan)
            return state, metrics

        return poisoned

    monkeypatch.setattr(T, 'jit_train_step', poisoned_jit)
    with pytest.raises(FloatingPointError):
        T.train_detector(cfg, str(tmp_path), max_steps=2, resume=False)
    assert osp.exists(str(tmp_path / 'nan_dump'))
