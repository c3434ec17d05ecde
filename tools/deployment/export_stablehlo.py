#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""Serialized-model export — the TPU-native analogue of the reference's
ONNX/TensorRT path (tools/deployment/pytorch2onnx.py, SURVEY.md §3.5).

Exports the full jitted inference program (forward -> decode -> NMS, all
shape-static) as:
  - StableHLO MLIR text (portable compiler IR, the ONNX analogue), and/or
  - a serialized ``jax.export`` artifact (weights baked in as constants;
    rehydrated + evaluated by tools/deployment/test.py exactly like the
    reference evals an exported ONNX model), and/or
  - a TensorFlow SavedModel via jax2tf (for TF-Serving-style deployment),
    when TensorFlow is available.
"""
import argparse


def export_eval_artifact(det, out_path, batch=8, img_size=640):
    """Serialize the eval-signature inference program
    ``(image, scale_factor, img_hw) -> (bboxes, scores, labels, valid)``
    with jax.export; the extra inputs carry per-image unpad shape + scale
    so the deployed model rescales detections to original-image coords the
    same way tools/test.py does (reference bbox rescale in _get_bboxes)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def infer(image, scale_factor, img_hw):
        pred_maps = det.model.apply(det.variables, image)
        res = det.model.get_bboxes(
            pred_maps, scale_factors=scale_factor,
            img_shape=(img_hw[:, 0:1], img_hw[:, 1:2]))
        return res.bboxes, res.scores, res.labels, res.valid

    exp = jexport.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.float32))
    blob = exp.serialize()
    with open(out_path, 'wb') as f:
        f.write(blob)
    return len(blob)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out', default='model.stablehlo.mlir')
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--jax-export', default=None,
                   help='also write a serialized jax.export artifact '
                        '(eval signature; consumed by deployment/test.py)')
    p.add_argument('--saved-model', default=None,
                   help='also export a TF SavedModel to this dir')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpudet.apis.inference import init_detector
    from tpudet.config import Config

    cfg = Config.fromfile(args.config)
    det = init_detector(cfg, args.checkpoint)

    def infer(image):
        pred_maps = det.model.apply(det.variables, image)
        res = det.model.get_bboxes(pred_maps)
        return res.bboxes, res.scores, res.labels, res.valid

    shape = (args.batch, args.img_size, args.img_size, 3)
    lowered = jax.jit(infer).lower(
        jax.ShapeDtypeStruct(shape, jnp.float32))
    mlir = lowered.as_text()
    with open(args.out, 'w') as f:
        f.write(mlir)
    print(f'wrote StableHLO ({len(mlir) / 1e6:.1f} MB) to {args.out}')

    if args.jax_export:
        n = export_eval_artifact(det, args.jax_export,
                                 batch=max(args.batch, 1),
                                 img_size=args.img_size)
        print(f'wrote jax.export artifact ({n / 1e6:.1f} MB) to '
              f'{args.jax_export}')

    if args.saved_model:
        from jax.experimental import jax2tf
        import tensorflow as tf
        tf_fn = tf.function(
            jax2tf.convert(infer, with_gradient=False),
            input_signature=[tf.TensorSpec(shape, tf.float32)],
            autograph=False)
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, args.saved_model)
        print(f'wrote SavedModel to {args.saved_model}')


if __name__ == '__main__':
    main()
