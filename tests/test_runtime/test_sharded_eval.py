"""Multi-host eval sharding: explicit process_index/process_count shards
must be disjoint-covering, and their merge must equal the full-run
results (reference DistributedSampler + collect_results semantics)."""
import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_ds(tmp_path_factory):
    import json

    import cv2
    root = tmp_path_factory.mktemp('coco_shard')
    rng = np.random.RandomState(5)
    images, annotations = [], []
    for i in range(7):  # odd count exercises the pad-to-equal-shards path
        fn = f'img{i}.jpg'
        cv2.imwrite(str(root / fn),
                    (rng.rand(64, 64, 3) * 255).astype(np.uint8))
        images.append(dict(id=i + 1, file_name=fn, width=64, height=64))
        annotations.append(dict(id=i + 1, image_id=i + 1,
                                bbox=[8, 8, 20, 20], area=400, iscrowd=0,
                                category_id=1))
    ann = root / 'ann.json'
    with open(ann, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='a')]), f)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(64, 64), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='RandomFlip'),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Normalize', mean=[114, 114, 114],
                      std=[255, 255, 255], to_rgb=True),
             ]),
    ]
    from tpudet.data.dataset import build_dataset
    return build_dataset(dict(type='CocoDataset', classes=('a',),
                              ann_file=str(ann), img_prefix=str(root),
                              pipeline=pipeline, test_mode=True))


def test_sharded_eval_union_equals_full(tiny_ds):
    import jax
    import jax.numpy as jnp

    from tpudet.apis.test import merge_sharded_results, single_device_test
    from tpudet.models.builder import build_detector

    model = build_detector(dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='RetinaHead', num_classes=1, in_channels=32,
                       feat_channels=32, stacked_convs=1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))

    full = single_device_test(model, variables, tiny_ds, batch_size=2,
                              img_size=64, progress=False)
    assert len(full) == 7

    shards = [
        single_device_test(model, variables, tiny_ds, batch_size=2,
                           img_size=64, progress=False,
                           process_index=i, process_count=2)
        for i in range(2)
    ]
    # each shard is a sparse [(idx, result), ...] list
    idx0 = {i for i, _ in shards[0]}
    idx1 = {i for i, _ in shards[1]}
    assert idx0 | idx1 == set(range(7))

    merged = merge_sharded_results(shards, len(tiny_ds))
    assert all(m is not None for m in merged)
    for m, f in zip(merged, full):
        for cm, cf in zip(m, f):
            np.testing.assert_allclose(cm, cf, atol=1e-5)


def test_tta_flip_runs_and_is_consistent(tiny_ds):
    """Flip TTA (wired through single_device_test) must produce valid
    padded detections; on a model + NMS budget where identity-aug alone
    is deterministic, TTA with the same image flipped twice keeps
    original-frame boxes inside the image."""
    import jax
    import jax.numpy as jnp

    from tpudet.apis.test import single_device_test
    from tpudet.models.builder import build_detector

    model = build_detector(dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, base_channels=16,
                      out_indices=[0, 1, 2, 3]),
        neck=dict(type='FPN', in_channels=[16, 32, 64, 128],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(type='RetinaHead', num_classes=1, in_channels=32,
                       feat_channels=32, stacked_convs=1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    out = single_device_test(model, variables, tiny_ds, batch_size=2,
                             img_size=64, progress=False, tta=True,
                             tta_score_thr=0.05, tta_max_per_img=20)
    assert len(out) == 7
    for per_cls in out:
        for arr in per_cls:
            if len(arr):
                assert np.isfinite(arr).all()
                assert (arr[:, 0] <= arr[:, 2] + 1e-3).all()
