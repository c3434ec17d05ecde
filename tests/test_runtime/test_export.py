"""StableHLO export CLI (tools/deployment/export_stablehlo.py) — the
ONNX-path analogue (reference tools/deployment/pytorch2onnx.py) must
actually produce a loadable, well-formed module for a config-built model.
"""
import importlib.util
import os.path as osp
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def test_export_stablehlo_cli(tmp_path):
    out = tmp_path / 'model.stablehlo.mlir'
    argv = sys.argv
    spec = importlib.util.spec_from_file_location(
        'export_stablehlo',
        osp.join(REPO, 'tools/deployment/export_stablehlo.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.argv = ['export_stablehlo.py',
                osp.join(REPO, 'configs/yolo/yolov3_d53_mstrain-608_273e_coco.py'),
                '--out', str(out), '--img-size', '64']
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = argv
    text = out.read_text()
    # a real lowered program: MLIR module with the inference entry and
    # the conv/NMS compute ops present
    assert text.startswith('module')
    assert 'func.func public @main' in text
    assert 'stablehlo.convolution' in text
    assert 'stablehlo.sort' in text or 'stablehlo.custom_call' in text
    assert len(text) > 100_000
