"""The full deployment loop as ONE chain — the artifacts a user would
actually ship are the same model end to end.

Reference analogue: train (tools/train.py) -> checkpoint ->
tools/deployment/pytorch2onnx.py -> tools/deployment/test.py eval of the
exported model == live tools/test.py eval, and the TorchServe image
(docker/serve + mmdet_handler.py) serving the same checkpoint. Each link
exists piecewise in test_train_api / test_export / test_deployment_eval
/ test_serve; this test chains them on ONE trained checkpoint:

  train 2 steps -> latest_ema.msgpack
    -> live eval (single_device_test + fast-bbox)
    -> jax.export artifact -> deployed eval: detections + report EQUAL
    -> HTTP model server on the same checkpoint: predictions on a
       dataset image equal the live inference_detector's.
"""
import importlib.util
import json
import os.path as osp
import threading
import urllib.request

import cv2
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))

pytestmark = pytest.mark.slow


def _load_tool(name, rel):
    spec = importlib.util.spec_from_file_location(name, osp.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MODEL = dict(
    type='SingleStageDetector',
    backbone=dict(type='DarknetCSP', scale='v4s5p', out_indices=[3, 4, 5]),
    neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
              out_channels=[64, 64, 64], csp_repetition=1),
    bbox_head=dict(type='YOLOCSPHead', num_classes=1,
                   in_channels=[64, 64, 64]),
    train_cfg=dict(),
    test_cfg=dict(min_bbox_size=0, nms_pre=-1, score_thr=0.01,
                  anchor_pre=256, class_pre=32,
                  nms=dict(type='nms', iou_threshold=0.65),
                  max_per_img=10))


@pytest.fixture(scope='module')
def loop_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('deploy_loop')
    rng = np.random.RandomState(3)
    images, annotations, aid = [], [], 1
    for i in range(8):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        x, y = rng.randint(4, 30, 2)
        w, h = rng.randint(16, 30, 2)
        cv2.rectangle(img, (x, y), (x + w, y + h), (0, 255, 0), -1)
        cv2.imwrite(str(root / f'img{i}.jpg'), img)
        images.append(dict(id=i + 1, file_name=f'img{i}.jpg',
                           width=64, height=64))
        annotations.append(dict(id=aid, image_id=i + 1, category_id=1,
                                bbox=[int(x), int(y), int(w), int(h)],
                                area=int(w * h), iscrowd=0))
        aid += 1
    (root / 'ann.json').write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name='thing')])))

    norm = "dict(mean=[114, 114, 114], std=[255, 255, 255], to_rgb=True)"
    cfg_path = root / 'cfg.py'
    cfg_path.write_text(f"""
model = {MODEL!r}
img_norm_cfg = {norm}
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(64, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Pad', size_divisor=32),
             dict(type='Normalize', **img_norm_cfg),
         ]),
]
data = dict(
    samples_per_gpu=1, workers_per_gpu=0, train_img_size=64, max_gts=4,
    train=dict(type='CocoDataset', ann_file='{root}/ann.json',
               img_prefix='{root}/', classes=('thing',),
               pipeline=train_pipeline),
    test=dict(type='CocoDataset', ann_file='{root}/ann.json',
              img_prefix='{root}/', classes=('thing',),
              pipeline=test_pipeline, test_mode=True))
optimizer = dict(lr=0.001, momentum=0.9, weight_decay=5e-4, nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=10))
lr_config = dict(min_lr_ratio=0.2)
custom_hooks = [dict(type='StateEMAHook', momentum=0.99,
                     nominal_batch_size=8, warm_up=10)]
runner = dict(max_epochs=1)
evaluation = dict(interval=0)
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
seed = 0
""")
    return root, str(cfg_path)


def test_deployment_loop(loop_setup, tmp_path):
    root, cfg_path = loop_setup

    from tpudet.apis.inference import inference_detector, init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.apis.train import train_detector
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    # 1. train -> checkpoint (the EMA export every user ships)
    cfg = Config.fromfile(cfg_path)
    work = tmp_path / 'work'
    train_detector(cfg, str(work), max_steps=2, resume=False)
    ckpt = work / 'latest_ema.msgpack'
    assert ckpt.exists()

    # 2. live eval from that checkpoint
    det = init_detector(cfg, str(ckpt))
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    live = single_device_test(det.model, det.variables, dataset,
                              batch_size=2, img_size=64, progress=False)
    annotations = [dataset.get_ann_info_test(i)
                   for i in range(len(dataset))]
    rep_live = coco_fast_bbox_eval(live, annotations,
                                   classes=dataset.CLASSES)

    # 3. export the SAME checkpointed model -> deployed eval must match
    export_mod = _load_tool('export_loop',
                            'tools/deployment/export_stablehlo.py')
    deploy_mod = _load_tool('deploy_loop', 'tools/deployment/test.py')
    artifact = tmp_path / 'model.jaxexp'
    export_mod.export_eval_artifact(det, str(artifact), batch=2,
                                    img_size=64)
    infer_fn = deploy_mod.load_exported_infer_fn(str(artifact), 2,
                                                 img_size=64)
    deployed = single_device_test(det.model, None, dataset,
                                  batch_size=2, img_size=64,
                                  progress=False, infer_fn=infer_fn)
    for lv, dp in zip(live, deployed):
        for lc, dc in zip(lv, dp):
            np.testing.assert_allclose(lc, dc, rtol=1e-5, atol=1e-5)
    rep_dep = coco_fast_bbox_eval(deployed, annotations,
                                  classes=dataset.CLASSES)
    for k in rep_live:
        np.testing.assert_array_equal(np.asarray(rep_live[k]),
                                      np.asarray(rep_dep[k]))

    # 4. HTTP model server on the same checkpoint: predictions equal the
    # live inference_detector's (64x64 source at img_size 64 -> both
    # paths see the identical canvas; only fp noise differs)
    serve = _load_tool('serve_loop', 'tools/deployment/serve.py')
    server = serve.ModelServer(MODEL, checkpoint=str(ckpt), batch=1,
                               img_size=64, score_thr=0.0,
                               max_batch_delay_ms=5.0)
    httpd = serve.ThreadingHTTPServer(
        ('127.0.0.1', 0), serve.make_handler(server, 'loop'))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        img_path = str(root / 'img0.jpg')
        body = open(img_path, 'rb').read()
        url = (f'http://127.0.0.1:{httpd.server_address[1]}'
               f'/predictions/loop')
        req = urllib.request.Request(
            url, data=body,
            headers={'Content-Type': 'application/octet-stream'})
        with urllib.request.urlopen(req, timeout=120) as r:
            served = json.loads(r.read())

        live_dets = inference_detector(det, img_path, pad_to=64)
        # flatten the live per-class numpy results to (box, score) rows;
        # the server clips boxes to the source image bounds (a barely
        # trained model emits out-of-frame boxes), so clip here too —
        # the assertion is "same model", scores stay exact
        live_rows = []
        for c, arr in enumerate(live_dets):
            for row in np.asarray(arr):
                box = np.clip(row[:4], [0, 0, 0, 0], [64, 64, 64, 64])
                live_rows.append((box, float(row[4]), c))
        live_rows.sort(key=lambda t: -t[1])

        assert len(served) == len(live_rows)
        for det_json, (box, score, c) in zip(
                sorted(served, key=lambda d: -d['score']), live_rows):
            (name,) = set(det_json) - {'score'}
            assert name == dataset.CLASSES[c]
            np.testing.assert_allclose(det_json[name], box, atol=1e-2)
            assert abs(det_json['score'] - score) < 1e-3
    finally:
        httpd.shutdown()
        server.close()
