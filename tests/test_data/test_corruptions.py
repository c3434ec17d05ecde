"""Native corruption implementations for the robustness benchmark."""
import numpy as np
import pytest

from tpudet.data.corruptions import (BENCHMARK_CORRUPTIONS, CORRUPTIONS,
                                     corrupt)


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return (rng.rand(64, 48, 3) * 255).astype(np.uint8)


@pytest.mark.parametrize('name', sorted(CORRUPTIONS))
def test_corruptions_shape_dtype_and_change(name, img):
    out = corrupt(img, name, severity=3)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # severity 3 visibly alters


@pytest.mark.parametrize('name', ['gaussian_noise', 'contrast',
                                  'pixelate'])
def test_severity_monotonic_distortion(name, img):
    """Higher severity should distort more (L1 from clean grows)."""
    d = [np.abs(corrupt(img, name, s).astype(np.int32) -
                img.astype(np.int32)).mean() for s in (1, 5)]
    assert d[1] > d[0]


def test_corrupt_deterministic(img):
    a = corrupt(img, 'gaussian_noise', 2, seed=7)
    b = corrupt(img, 'gaussian_noise', 2, seed=7)
    np.testing.assert_array_equal(a, b)


def test_benchmark_list_is_implemented():
    for name in BENCHMARK_CORRUPTIONS:
        assert name in CORRUPTIONS
