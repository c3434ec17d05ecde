"""On-device fused mosaic/affine/HSV augmentation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.data.device_aug import (device_mosaic_affine, hsv_jitter,
                                    sample_affine)


def make_inputs(b=2, s=64, g=3, seed=0):
    rng = np.random.RandomState(seed)
    tiles = (rng.rand(b, 4, s, s, 3) * 255).astype(np.uint8)
    tile_hw = np.full((b, 4, 2), s, np.int32)
    # vary tile content sizes (letterbox shapes)
    tile_hw[:, 1] = (s // 2, s)
    tile_hw[:, 2] = (s, s // 2)
    boxes = np.zeros((b, 4, g, 4), np.float32)
    valid = np.zeros((b, 4, g), bool)
    labels = np.zeros((b, 4, g), np.int32)
    for i in range(b):
        for q in range(4):
            h_q, w_q = tile_hw[i, q]
            n = rng.randint(1, g + 1)
            xy = rng.rand(n, 2) * [w_q * 0.5, h_q * 0.5]
            wh = rng.rand(n, 2) * [w_q * 0.4, h_q * 0.4] + 4
            boxes[i, q, :n] = np.concatenate(
                [xy, np.minimum(xy + wh, [w_q, h_q])], -1)
            valid[i, q, :n] = True
            labels[i, q, :n] = rng.randint(0, 5, n)
    return (jnp.asarray(tiles), jnp.asarray(tile_hw), jnp.asarray(boxes),
            jnp.asarray(valid), jnp.asarray(labels))


def test_device_aug_shapes_and_ranges():
    tiles, tile_hw, boxes, valid, labels = make_inputs(s=64)
    out = device_mosaic_affine(
        tiles, tile_hw, boxes, valid, labels, jax.random.PRNGKey(0),
        out_size=64, pad_to=192, crop=128, scale_limit=0.5)
    assert out['img'].shape == (2, 64, 64, 3)
    assert out['gt_bboxes'].shape == (2, 12, 4)
    assert out['gt_valid'].shape == (2, 12)
    img = np.asarray(out['img'])
    assert np.isfinite(img).all()
    # normalized range: (0-114)/255 .. (255-114)/255
    assert img.min() >= -0.45 - 1e-5
    assert img.max() <= 0.56

    b = np.asarray(out['gt_bboxes'])
    v = np.asarray(out['gt_valid'])
    if v.any():
        kept = b[v]
        assert (kept >= -1e-3).all() and (kept <= 64 + 1e-3).all()
        assert (kept[:, 2] >= kept[:, 0]).all()


def test_affine_roundtrip_boxes_vs_pixels():
    """A gt-box corner and the pixel grid must move under the SAME map:
    warping an identity-coordinate image and reading the value at the
    transformed box corner recovers the canvas coordinate."""
    key = jax.random.PRNGKey(3)
    aff = sample_affine(key, canvas=128, pad_to=192, crop=128,
                        scale_limit=0.5, out=64)
    # pick canvas point, map to out coords via box path, then map back
    pts = jnp.asarray([[10., 20., 50., 60.], [0., 0., 128., 128.]])
    out_boxes = aff.canvas_to_out_boxes(pts)
    # map each corner back with out_to_canvas
    c1 = aff.out_to_canvas(out_boxes[:, :2])
    c2 = aff.out_to_canvas(out_boxes[:, 2:])
    flipped = bool(aff.flip)
    got = np.sort(np.stack([np.asarray(c1)[:, 0], np.asarray(c2)[:, 0]], -1),
                  axis=-1)
    want = np.sort(np.stack([np.asarray(pts)[:, 0], np.asarray(pts)[:, 2]],
                            -1), axis=-1)
    # x roundtrip: exact up to the flip's half-pixel convention
    np.testing.assert_allclose(got, want, atol=1.01 if flipped else 1e-3)
    np.testing.assert_allclose(np.asarray(c1)[:, 1], np.asarray(pts)[:, 1],
                               atol=1e-3)


def test_hsv_jitter_identity_and_bounds():
    img = jnp.asarray(
        (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.float32))
    # zero ratios -> identity
    out = hsv_jitter(img, jax.random.PRNGKey(0), 0., 0., 0.)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.5)
    # jittered output stays in range
    out2 = hsv_jitter(img, jax.random.PRNGKey(1), 0.015, 0.7, 0.4)
    assert float(out2.min()) >= -1e-3
    assert float(out2.max()) <= 255.001


def test_mosaic_canvas_content():
    """With identity-ish affine (no pad, crop == canvas, no scale), the
    output equals the mosaic canvas; tile placement must anchor at the
    canvas center."""
    s = 32
    tiles = np.zeros((1, 4, s, s, 3), np.uint8)
    for q in range(4):
        tiles[0, q] = (q + 1) * 50
    tile_hw = np.full((1, 4, 2), s, np.int32)
    boxes = np.zeros((1, 4, 1, 4), np.float32)
    valid = np.zeros((1, 4, 1), bool)
    labels = np.zeros((1, 4, 1), np.int32)
    out = device_mosaic_affine(
        jnp.asarray(tiles), jnp.asarray(tile_hw), jnp.asarray(boxes),
        jnp.asarray(valid), jnp.asarray(labels), jax.random.PRNGKey(5),
        out_size=2 * s, pad_to=2 * s, crop=2 * s, scale_limit=0.0,
        hue_ratio=0., saturation_ratio=0., value_ratio=0.)
    img = np.asarray(out['img']) * 255 + 114  # denormalize (RGB == grey)
    # quadrants: TL=tile0, TR=tile1, BL=tile2, BR=tile3 (up to hflip)
    q_tl = img[0, 8, 8, 0]
    q_tr = img[0, 8, -8, 0]
    q_bl = img[0, -8, 8, 0]
    q_br = img[0, -8, -8, 0]
    vals = {round(float(v)) for v in (q_tl, q_tr, q_bl, q_br)}
    assert vals == {50, 100, 150, 200}
    # flip preserves rows
    assert {round(float(q_tl)), round(float(q_tr))} == {50, 100}
    assert {round(float(q_bl)), round(float(q_br))} == {150, 200}
