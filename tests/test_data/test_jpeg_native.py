"""Parity tests: native C++ JPEG loader vs the cv2 path.

The native loader (tpudet/ops/native/jpeg_loader.cc) is the TPU-host
equivalent of the reference's turbojpeg decode backend
(/root/reference/mmdet/datasets/pipelines/loading.py:35-41); its
decode must be bit-identical to cv2.imdecode (both are libjpeg-turbo)
and its fused letterbox must match the Python
tools/e2e_bench.py::decode_letterbox semantics exactly.
"""
import os

import cv2
import numpy as np
import pytest

from tpudet.ops.native import jpeg_native as jn

pytestmark = pytest.mark.skipif(not jn.available(),
                                reason='native jpeg loader unavailable')


def _jpeg(h, w, seed=0, quality=90, gray=False):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 3)
    if gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    ok, buf = cv2.imencode('.jpg', img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return buf.tobytes()


def _cv2_letterbox(jpeg, size):
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    h, w = img.shape[:2]
    f = min(size / h, size / w)
    nw, nh = int(w * f + 0.5), int(h * f + 0.5)
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((size, size, 3), np.uint8)
    canvas[:nh, :nw] = img
    return canvas, np.array([nw / w, nh / h, nw / w, nh / h], np.float32)


def test_info_matches_header():
    assert jn.jpeg_info(_jpeg(123, 457)) == (123, 457)
    assert jn.jpeg_info(b'not a jpeg') is None


def test_decode_bit_identical_to_cv2():
    for h, w, seed in [(480, 640, 0), (333, 217, 1), (64, 64, 2)]:
        jpeg = _jpeg(h, w, seed)
        ref = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
        mine = jn.decode(jpeg, bgr=True)
        assert mine is not None and mine.shape == ref.shape
        np.testing.assert_array_equal(mine, ref)


def test_letterbox_matches_python_path():
    for h, w, size in [(480, 640, 640), (640, 480, 640), (500, 500, 320),
                       (123, 777, 416)]:
        jpeg = _jpeg(h, w, seed=h + w)
        ref, sref = _cv2_letterbox(jpeg, size)
        out = jn.decode_letterbox(jpeg, size, size, pad_val=0, bgr=True)
        assert out is not None
        mine, smine = out
        np.testing.assert_allclose(smine, sref, rtol=1e-6)
        # decode is bit-identical; the fixed-point bilinear rounds once
        # at the end where cv2 rounds per stage, so resized pixels can
        # differ by at most 1 LSB
        diff = np.abs(ref.astype(np.int16) - mine.astype(np.int16))
        assert diff.max() <= 1, diff.max()


def test_upscale_small_image():
    jpeg = _jpeg(100, 150, seed=3)
    ref, sref = _cv2_letterbox(jpeg, 320)
    mine, smine = jn.decode_letterbox(jpeg, 320, 320)
    np.testing.assert_allclose(smine, sref, rtol=1e-6)
    diff = np.abs(ref.astype(np.int16) - mine.astype(np.int16))
    assert diff.max() <= 1


def test_pad_value_fills_border():
    jpeg = _jpeg(240, 640, seed=4)
    mine, _ = jn.decode_letterbox(jpeg, 640, 640, pad_val=114)
    assert (mine[241:] == 114).all()  # below the letterboxed image


def test_fast_scale_close_to_full():
    jpeg = _jpeg(960, 1280, seed=5)
    full, sf = jn.decode_letterbox(jpeg, 320, 320, fast_scale=False)
    fast, sf2 = jn.decode_letterbox(jpeg, 320, 320, fast_scale=True)
    np.testing.assert_allclose(sf, sf2, rtol=1e-6)
    diff = np.abs(full.astype(np.int16) - fast.astype(np.int16))
    # DCT-domain downscale then bilinear vs full decode then bilinear
    assert diff.mean() < 2.0 and diff.max() <= 32


def test_batch_matches_single_and_flags_bad():
    jpegs = [_jpeg(480, 640, s) for s in range(4)] + [b'broken']
    out, sf, status = jn.decode_letterbox_batch(jpegs, 320, 320,
                                                pad_val=7, n_threads=2)
    assert status.tolist() == [0, 0, 0, 0, 1]
    assert (out[4] == 7).all()
    for i in range(4):
        single, s_single = jn.decode_letterbox(jpegs[i], 320, 320,
                                               pad_val=7)
        np.testing.assert_array_equal(out[i], single)
        np.testing.assert_allclose(sf[i], s_single, rtol=1e-6)


def test_grayscale_jpeg_matches_cv2():
    # libjpeg's gray->EXT_BGR conversion replicates channels exactly like
    # cv2.imdecode(IMREAD_COLOR)
    jpeg = _jpeg(100, 100, gray=True)
    ref = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(jn.decode(jpeg), ref)


def test_pipeline_backend_switch(tmp_path):
    from tpudet.data.pipelines import LoadImageFromFile
    jpeg = _jpeg(200, 300, seed=6)
    path = tmp_path / 'img.jpg'
    path.write_bytes(jpeg)
    results = dict(img_info=dict(filename='img.jpg'),
                   img_prefix=str(tmp_path))
    via_cv2 = LoadImageFromFile()(dict(results))['img']
    via_native = LoadImageFromFile(
        im_decode_backend='turbojpeg')(dict(results))['img']
    np.testing.assert_array_equal(via_cv2, via_native)

    # non-JPEG file falls back to cv2 inside the native backend
    png = tmp_path / 'img.png'
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    cv2.imwrite(str(png), img)
    results_png = dict(img_info=dict(filename='img.png'),
                       img_prefix=str(tmp_path))
    via_native_png = LoadImageFromFile(
        im_decode_backend='turbojpeg')(dict(results_png))['img']
    np.testing.assert_array_equal(via_native_png, img)


def test_e2e_bench_host_loader_parity():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        'tools'))
    from e2e_bench import make_host_loader
    jpegs = [_jpeg(480, 640, s) for s in range(3)]
    native, kind_n = make_host_loader('native', 320)
    cv2_loader, kind_c = make_host_loader('cv2', 320)
    assert kind_n == 'native' and kind_c == 'cv2'
    imgs_n, sf_n = native(jpegs)
    imgs_c, sf_c = cv2_loader(jpegs)
    np.testing.assert_allclose(sf_n, sf_c, rtol=1e-6)
    diff = np.abs(imgs_n.astype(np.int16) - imgs_c.astype(np.int16))
    assert diff.max() <= 1
