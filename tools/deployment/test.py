#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Test (and eval) a SERIALIZED exported model — the analogue of the
reference's `tools/deployment/test.py`, which evals an exported ONNX model
through ONNXRuntimeDetector + the standard single_gpu_test/eval flow
(reference tools/deployment/test.py:1-110).

Here the artifact is a ``jax.export`` serialization (weights baked in,
written by tools/deployment/export_stablehlo.py --jax-export). It is
rehydrated and driven through the exact same eval protocol as a live
model (tpudet/apis/test.py::single_device_test with an infer_fn
override), so the deployed artifact's mAP can be compared 1:1 against
tools/test.py on the in-process model.
"""
import argparse
import json


def parse_args():
    p = argparse.ArgumentParser(
        description='Test (and eval) a serialized exported detector')
    p.add_argument('config', help='test config file path')
    p.add_argument('model', help='jax.export artifact '
                                 '(export_stablehlo.py --jax-export)')
    p.add_argument('--batch-size', type=int, default=8,
                   help='MUST match the batch the artifact was exported '
                        'with (exported programs are shape-static); '
                        'short tail batches are zero-padded')
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--out', help='dump eval report json')
    return p.parse_args()


def load_exported_infer_fn(path, batch_size, img_size=None):
    """Rehydrate the artifact into a single_device_test infer_fn.

    The exported program is shape-static at ``batch_size``; tail batches
    are zero-padded up and the outputs sliced back down."""
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from tpudet.core.nms import NMSResult

    with open(path, 'rb') as f:
        exp = jexport.deserialize(bytearray(f.read()))

    # fail with a clear message when the CLI's shapes don't match what the
    # artifact was exported with, instead of an opaque aval mismatch from
    # exp.call (image input is (B, H, W, 3))
    img_aval = exp.in_avals[0]
    exp_batch, exp_h, exp_w = (img_aval.shape[0], img_aval.shape[1],
                               img_aval.shape[2])
    if exp_batch != batch_size:
        raise SystemExit(
            f'artifact was exported at batch_size={exp_batch} but '
            f'--batch-size={batch_size}; rerun with '
            f'--batch-size {exp_batch} or re-export')
    if img_size is not None and (exp_h, exp_w) != (img_size, img_size):
        raise SystemExit(
            f'artifact was exported at {exp_h}x{exp_w} input but '
            f'--img-size={img_size}; rerun with --img-size {exp_h} '
            f'or re-export')

    def infer_fn(variables, img, scale_factor, img_hw):
        del variables  # weights are baked into the artifact
        img = np.asarray(img, np.float32)
        scale_factor = np.asarray(scale_factor, np.float32)
        img_hw = np.asarray(img_hw, np.float32)
        b = img.shape[0]
        if b < batch_size:
            pad = batch_size - b
            img = np.pad(img, ((0, pad),) + ((0, 0),) * (img.ndim - 1))
            scale_factor = np.pad(scale_factor, ((0, pad), (0, 0)),
                                  constant_values=1.0)
            img_hw = np.pad(img_hw, ((0, pad), (0, 0)),
                            constant_values=1.0)
        elif b > batch_size:
            raise ValueError(
                f'batch {b} > exported batch {batch_size}; re-export or '
                f'lower --batch-size')
        bboxes, scores, labels, valid = exp.call(
            jnp.asarray(img), jnp.asarray(scale_factor),
            jnp.asarray(img_hw))
        return NMSResult(bboxes[:b], scores[:b], labels[:b], valid[:b])

    return infer_fn


def main():
    args = parse_args()

    from tpudet.apis.test import single_device_test
    from tpudet.config import Config
    from tpudet.data.dataset import build_dataset
    from tpudet.evaluation.mean_ap import coco_fast_bbox_eval
    from tpudet.models.builder import build_detector

    cfg = Config.fromfile(args.config)
    # structure only (num_classes, head type); no weights are loaded —
    # they live inside the exported artifact
    model = build_detector(dict(cfg['model']))
    dataset = build_dataset({**cfg['data']['test'], 'test_mode': True})
    infer_fn = load_exported_infer_fn(args.model, args.batch_size,
                                      img_size=args.img_size)
    results = single_device_test(model, None, dataset,
                                 batch_size=args.batch_size,
                                 img_size=args.img_size,
                                 infer_fn=infer_fn)
    annotations = [
        dataset.get_ann_info_test(i) for i in range(len(dataset))
    ]
    report = coco_fast_bbox_eval(results, annotations,
                                 classes=dataset.CLASSES)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f)


if __name__ == '__main__':
    main()
