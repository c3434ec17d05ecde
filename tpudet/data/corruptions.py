"""Native image corruptions for robustness benchmarking (reference
tools/analysis_tools/test_robustness.py drives the external
``imagecorruptions`` package; that package is not available here, so the
benchmark corruptions are re-implemented with numpy/cv2).

Implemented (severity 1..5, constants from the imagecorruptions
reference implementation): gaussian_noise, shot_noise, impulse_noise,
speckle_noise, defocus_blur, motion_blur, zoom_blur, gaussian_blur,
brightness, contrast, saturate, pixelate, jpeg_compression, fog.
Omitted (asset- or scipy-dependent in the original): glass_blur, snow,
frost, spatter, elastic_transform.

All functions take/return uint8 RGB (H, W, 3).
"""
from __future__ import annotations

import numpy as np

BENCHMARK_CORRUPTIONS = [
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'motion_blur', 'zoom_blur', 'fog', 'brightness', 'contrast',
    'pixelate', 'jpeg_compression',
]


def _clip(x):
    return np.clip(x, 0, 255).astype(np.uint8)


def gaussian_noise(img, severity=1, rng=None):
    c = [.08, .12, 0.18, 0.26, 0.38][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = img.astype(np.float32) / 255.
    return _clip((x + rng.normal(size=x.shape, scale=c)) * 255)


def shot_noise(img, severity=1, rng=None):
    c = [60, 25, 12, 5, 3][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = img.astype(np.float32) / 255.
    return _clip(rng.poisson(x * c) / c * 255)


def impulse_noise(img, severity=1, rng=None):
    c = [.03, .06, .09, 0.17, 0.27][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = img.copy()
    m = rng.rand(*x.shape[:2])
    x[m < c / 2] = 0
    x[m > 1 - c / 2] = 255
    return x


def speckle_noise(img, severity=1, rng=None):
    c = [.15, .2, 0.35, 0.45, 0.6][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = img.astype(np.float32) / 255.
    return _clip((x + x * rng.normal(size=x.shape, scale=c)) * 255)


def gaussian_blur(img, severity=1, rng=None):
    import cv2
    c = [1, 2, 3, 4, 6][severity - 1]
    return cv2.GaussianBlur(img, (0, 0), c)


def defocus_blur(img, severity=1, rng=None):
    import cv2
    c = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    r, alias = c
    k = np.zeros((2 * r + 1, 2 * r + 1), np.float32)
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    k[(xx**2 + yy**2) <= (r + alias)**2] = 1.
    k /= k.sum()
    return _clip(cv2.filter2D(img.astype(np.float32), -1, k))


def motion_blur(img, severity=1, rng=None):
    import cv2
    c = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    size, _ = c
    k = np.zeros((size, size), np.float32)
    k[size // 2] = 1.
    # rotate the line kernel 45 degrees
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), 45, 1.0)
    k = cv2.warpAffine(k, m, (size, size))
    k /= max(k.sum(), 1e-6)
    return _clip(cv2.filter2D(img.astype(np.float32), -1, k))


def zoom_blur(img, severity=1, rng=None):
    import cv2  # noqa: F401 (used below)
    zooms = [np.arange(1, 1.11, 0.01), np.arange(1, 1.16, 0.01),
             np.arange(1, 1.21, 0.02), np.arange(1, 1.26, 0.02),
             np.arange(1, 1.31, 0.03)][severity - 1]
    h, w = img.shape[:2]
    x = img.astype(np.float32)
    out = np.zeros_like(x)
    for z in zooms:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        zimg = cv2.resize(img, (zw, zh))
        top = (zh - h) // 2
        left = (zw - w) // 2
        out += zimg[top:top + h, left:left + w].astype(np.float32)
    return _clip((x + out) / (len(zooms) + 1))


def fog(img, severity=1, rng=None):
    c = [(1.5, 2), (2., 2), (2.5, 1.7), (2.5, 1.5), (3., 1.4)][severity - 1]
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    size = 1 << int(np.ceil(np.log2(max(h, w))))
    # diamond-square-ish plasma fractal via upsampled octaves
    import cv2
    plasma = np.zeros((size, size), np.float32)
    scale, amp = size, 1.0
    while scale >= 1:
        noise = rng.rand(max(size // max(scale, 1), 1),
                         max(size // max(scale, 1), 1)).astype(np.float32)
        plasma += amp * cv2.resize(noise, (size, size),
                                   interpolation=cv2.INTER_LINEAR)
        scale //= 2
        amp /= c[1]
    plasma = plasma[:h, :w]
    plasma = (plasma - plasma.min()) / max(plasma.max() - plasma.min(),
                                           1e-6)
    x = img.astype(np.float32) / 255.
    max_val = x.max()
    x = x + c[0] / 3. * plasma[..., None]
    return _clip(x * max_val / max(x.max(), 1e-6) * 255)


def brightness(img, severity=1, rng=None):
    c = [.1, .2, .3, .4, .5][severity - 1]
    x = img.astype(np.float32) / 255.
    return _clip((x + c) * 255)


def contrast(img, severity=1, rng=None):
    c = [0.4, .3, .2, .1, .05][severity - 1]
    x = img.astype(np.float32) / 255.
    means = x.mean(axis=(0, 1), keepdims=True)
    return _clip(((x - means) * c + means) * 255)


def saturate(img, severity=1, rng=None):
    import cv2
    c = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * c[0] + c[1] * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def pixelate(img, severity=1, rng=None):
    import cv2
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity=1, rng=None):
    import cv2
    c = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode('.jpg', img[..., ::-1],
                           [int(cv2.IMWRITE_JPEG_QUALITY), c])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]


CORRUPTIONS = {
    f.__name__: f for f in [
        gaussian_noise, shot_noise, impulse_noise, speckle_noise,
        gaussian_blur, defocus_blur, motion_blur, zoom_blur, fog,
        brightness, contrast, saturate, pixelate, jpeg_compression,
    ]
}


def corrupt(img, corruption: str, severity: int, seed: int = 0):
    """Apply a named corruption at a severity (1..5) to an RGB uint8
    image, deterministically per (image, seed)."""
    assert corruption in CORRUPTIONS, f'unknown corruption {corruption}'
    assert 1 <= severity <= 5
    rng = np.random.RandomState(seed)
    return CORRUPTIONS[corruption](np.ascontiguousarray(img), severity,
                                   rng)
