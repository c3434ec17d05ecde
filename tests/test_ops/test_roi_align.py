"""RoIAlign vs an independent numpy bilinear reference."""
import jax.numpy as jnp
import numpy as np

from tpudet.ops.roi_align import multilevel_roi_align, roi_align


def numpy_roi_align(feat, rois, out_size, spatial_scale, n):
    """Straightforward scalar re-derivation of aligned RoIAlign."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), out_size, out_size, c), np.float32)

    def bilinear(y, x):
        if y < -1 or y > h or x < -1 or x > w:
            return np.zeros(c, np.float32)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - y0, x - x0
        val = np.zeros(c, np.float32)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    val += wy * wx * feat[yi, xi]
        return val

    for p, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * spatial_scale
        rw = max(x2 - x1, 1e-3)
        rh = max(y2 - y1, 1e-3)
        bw, bh = rw / out_size, rh / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(c, np.float32)
                for sy in range(n):
                    for sx in range(n):
                        y = y1 + (oy + (sy + 0.5) / n) * bh - 0.5
                        x = x1 + (ox + (sx + 0.5) / n) * bw - 0.5
                        acc += bilinear(y, x)
                out[p, oy, ox] = acc / (n * n)
    return out


def test_roi_align_matches_numpy():
    rng = np.random.RandomState(0)
    feat = rng.rand(16, 20, 3).astype(np.float32)
    rois = np.array([[0., 0., 32., 32.], [8., 4., 60., 40.],
                     [10., 10., 14., 14.]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=4, spatial_scale=0.25,
                               sampling_ratio=2))
    want = numpy_roi_align(feat, rois, 4, 0.25, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multilevel_selects_by_scale():
    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.rand(64 // s, 64 // s, 2).astype(np.float32))
             for s in (1, 2, 4, 8)]  # strides 4,8,16,32 at img 256
    # small roi -> level 0; large -> higher level
    rois = jnp.asarray(np.array([[0., 0., 40., 40.],
                                 [0., 0., 250., 250.]], np.float32))
    valid = jnp.asarray([True, True])
    out = multilevel_roi_align(feats, rois, valid, out_size=2,
                               strides=(4, 8, 16, 32))
    assert out.shape == (2, 2, 2, 2)
    assert np.isfinite(np.asarray(out)).all()
    # invalid rois are zeroed
    out2 = multilevel_roi_align(feats, rois, jnp.asarray([False, True]),
                                out_size=2, strides=(4, 8, 16, 32))
    assert np.allclose(np.asarray(out2)[0], 0)
    assert not np.allclose(np.asarray(out2)[1], 0)
