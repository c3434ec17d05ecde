"""Deployment-artifact eval (tools/deployment/test.py) — the reference's
exported-model eval flow (reference tools/deployment/test.py: eval an
ONNX model through ONNXRuntimeDetector + the standard test/eval protocol).

The serialized jax.export artifact, rehydrated in a fresh context, must
produce the SAME eval report as the live in-process model through the
same single_device_test flow — including on a tail batch smaller than the
exported batch (zero-pad + slice path).
"""
import importlib.util
import json
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _load_tool(name, rel):
    spec = importlib.util.spec_from_file_location(name, osp.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def tiny_setup(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('deploy_eval')
    rng = np.random.RandomState(7)
    images, annotations = [], []
    for i in range(5):  # 5 images at batch 2 -> a tail batch of 1
        fn = f'img{i}.jpg'
        cv2.imwrite(str(root / fn),
                    (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        images.append(dict(id=i + 1, file_name=fn, width=64, height=64))
        annotations.append(dict(id=i + 1, image_id=i + 1,
                                bbox=[8, 8, 24, 24], area=576, iscrowd=0,
                                category_id=1))
    with open(root / 'ann.json', 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='a')]), f)
    cfg_path = root / 'cfg.py'
    cfg_path.write_text(f"""
model = dict(
    type='RetinaNet',
    backbone=dict(type='ResNet', depth=18, base_channels=16,
                  out_indices=[0, 1, 2, 3]),
    neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
              out_channels=32, start_level=1,
              add_extra_convs='on_input', num_outs=5),
    bbox_head=dict(type='RetinaHead', num_classes=1, in_channels=32,
                   feat_channels=32, stacked_convs=1),
    test_cfg=dict(nms_pre=256, min_bbox_size=0, score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.5),
                  max_per_img=20))
data = dict(test=dict(
    type='CocoDataset', classes=('a',),
    ann_file='{root}/ann.json', img_prefix='{root}',
    pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Normalize', mean=[0, 0, 0],
                      std=[255, 255, 255], to_rgb=True),
             ]),
    ]))
""")
    return root, str(cfg_path)


def test_exported_artifact_eval_matches_live(tiny_setup, tmp_path):
    root, cfg_path = tiny_setup
    export_mod = _load_tool('export_stablehlo_t',
                            'tools/deployment/export_stablehlo.py')
    deploy_mod = _load_tool('deployment_test_t', 'tools/deployment/test.py')

    from tpudet.apis.inference import init_detector
    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval

    cfg = Config.fromfile(cfg_path)
    det = init_detector(cfg)

    artifact = tmp_path / 'model.jaxexp'
    n = export_mod.export_eval_artifact(det, str(artifact), batch=2,
                                        img_size=64)
    assert n > 1000 and artifact.exists()

    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    live = single_device_test(det.model, det.variables, dataset,
                              batch_size=2, img_size=64, progress=False)

    # the live variables are NOT passed: weights must come from the blob
    infer_fn = deploy_mod.load_exported_infer_fn(str(artifact), 2)
    deployed = single_device_test(det.model, None, dataset,
                                  batch_size=2, img_size=64,
                                  progress=False, infer_fn=infer_fn)

    assert len(live) == len(deployed) == len(dataset)
    for lv, dp in zip(live, deployed):
        for lc, dc in zip(lv, dp):
            np.testing.assert_allclose(lc, dc, rtol=1e-5, atol=1e-5)

    annotations = [dataset.get_ann_info_test(i)
                   for i in range(len(dataset))]
    rep_live = coco_fast_bbox_eval(live, annotations,
                                   classes=dataset.CLASSES)
    rep_dep = coco_fast_bbox_eval(deployed, annotations,
                                  classes=dataset.CLASSES)
    assert rep_live.keys() == rep_dep.keys()
    for k in rep_live:
        np.testing.assert_array_equal(np.asarray(rep_live[k]),
                                      np.asarray(rep_dep[k]))


def test_deployment_cli_end_to_end(tiny_setup, tmp_path):
    root, cfg_path = tiny_setup
    export_mod = _load_tool('export_stablehlo_t2',
                            'tools/deployment/export_stablehlo.py')
    from tpudet.apis.inference import init_detector
    from tpudet.config import Config

    det = init_detector(Config.fromfile(cfg_path))
    artifact = tmp_path / 'model.jaxexp'
    export_mod.export_eval_artifact(det, str(artifact), batch=2,
                                    img_size=64)

    out = tmp_path / 'report.json'
    deploy_mod = _load_tool('deployment_test_t2', 'tools/deployment/test.py')
    argv = sys.argv
    sys.argv = ['test.py', cfg_path, str(artifact), '--batch-size', '2',
                '--img-size', '64', '--out', str(out)]
    try:
        deploy_mod.main()
    finally:
        sys.argv = argv
    report = json.loads(out.read_text())
    assert 'map' in report and 'map50' in report
