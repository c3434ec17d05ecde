"""Functional cv2-backed image ops matching mmcv semantics (the subset
the reference data pipelines use)."""
import cv2
import numpy as np

interp_codes = {
    'nearest': cv2.INTER_NEAREST,
    'bilinear': cv2.INTER_LINEAR,
    'bicubic': cv2.INTER_CUBIC,
    'area': cv2.INTER_AREA,
    'lanczos': cv2.INTER_LANCZOS4,
}

_backend = 'cv2'


def use_backend(backend):
    global _backend
    _backend = backend


def imread(path, flag='color', channel_order='bgr'):
    flags = {'color': cv2.IMREAD_COLOR, 'grayscale': cv2.IMREAD_GRAYSCALE,
             'unchanged': cv2.IMREAD_UNCHANGED}[flag]
    img = cv2.imread(str(path), flags)
    if img is not None and channel_order == 'rgb' and img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def imwrite(img, path, params=None):
    return cv2.imwrite(str(path), img, params)


def imfrombytes(content, flag='color', channel_order='bgr'):
    img_np = np.frombuffer(content, np.uint8)
    flags = {'color': cv2.IMREAD_COLOR, 'grayscale': cv2.IMREAD_GRAYSCALE,
             'unchanged': cv2.IMREAD_UNCHANGED}[flag]
    img = cv2.imdecode(img_np, flags)
    if img is not None and channel_order == 'rgb' and img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def _scale_size(size, scale):
    w, h = size
    return int(w * float(scale) + 0.5), int(h * float(scale) + 0.5)


def rescale_size(old_size, scale, return_scale=False):
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    elif isinstance(scale, tuple):
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    else:
        raise TypeError(f'invalid scale {scale}')
    new_size = _scale_size((w, h), scale_factor)
    if return_scale:
        return new_size, scale_factor
    return new_size


def imresize(img, size, return_scale=False, interpolation='bilinear',
             out=None, backend=None):
    h, w = img.shape[:2]
    resized = cv2.resize(img, size, dst=out,
                         interpolation=interp_codes[interpolation])
    if not return_scale:
        return resized
    return resized, size[0] / w, size[1] / h


def imrescale(img, scale, return_scale=False, interpolation='bilinear',
              backend=None):
    h, w = img.shape[:2]
    new_size, scale_factor = rescale_size((w, h), scale, return_scale=True)
    rescaled = imresize(img, new_size, interpolation=interpolation)
    if return_scale:
        return rescaled, scale_factor
    return rescaled


def imresize_like(img, dst_img, return_scale=False,
                  interpolation='bilinear'):
    h, w = dst_img.shape[:2]
    return imresize(img, (w, h), return_scale, interpolation)


def imflip(img, direction='horizontal'):
    if direction == 'horizontal':
        return np.flip(img, axis=1)
    elif direction == 'vertical':
        return np.flip(img, axis=0)
    return np.flip(img, axis=(0, 1))


def impad(img, *, shape=None, padding=None, pad_val=0,
          padding_mode='constant'):
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)
    if isinstance(padding, (int, float)):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[1], padding[0], padding[1])
    border_type = {'constant': cv2.BORDER_CONSTANT,
                   'edge': cv2.BORDER_REPLICATE,
                   'reflect': cv2.BORDER_REFLECT_101,
                   'symmetric': cv2.BORDER_REFLECT}[padding_mode]
    if isinstance(pad_val, (int, float)):
        n_ch = img.shape[2] if img.ndim == 3 else 1
        pad_val = tuple([pad_val] * n_ch) if n_ch > 1 else pad_val
    return cv2.copyMakeBorder(img, padding[1], padding[3], padding[0],
                              padding[2], border_type, value=pad_val)


def impad_to_multiple(img, divisor, pad_val=0):
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def imnormalize(img, mean, std, to_rgb=True):
    img = img.copy().astype(np.float32)
    mean = np.float64(np.array(mean).reshape(1, -1))
    stdinv = 1 / np.float64(np.array(std).reshape(1, -1))
    if to_rgb:
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB, img)
    cv2.subtract(img, mean, img)
    cv2.multiply(img, stdinv, img)
    return img


def imdenormalize(img, mean, std, to_bgr=True):
    img = (img * std.reshape(1, -1)) + mean.reshape(1, -1)
    if to_bgr:
        img = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2BGR)
    return img


def bgr2rgb(img):
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def rgb2bgr(img):
    return cv2.cvtColor(img, cv2.COLOR_RGB2BGR)


def bgr2hsv(img):
    return cv2.cvtColor(img, cv2.COLOR_BGR2HSV)


def hsv2bgr(img):
    return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)


def bgr2gray(img, keepdim=False):
    out = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if keepdim:
        out = out[..., None]
    return out


def gray2bgr(img):
    if img.ndim == 2:
        img = img[..., None]
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def imcrop(img, bboxes, scale=1.0, pad_fill=None):
    x1, y1, x2, y2 = bboxes.astype(np.int32).tolist() \
        if hasattr(bboxes, 'astype') else bboxes
    return img[y1:y2 + 1, x1:x2 + 1]


def imrotate(img, angle, center=None, scale=1.0, border_value=0,
             interpolation='bilinear', auto_bound=False):
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, scale)
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=interp_codes[interpolation],
                          borderValue=border_value)


def imshear(img, magnitude, direction='horizontal', border_value=0,
            interpolation='bilinear'):
    h, w = img.shape[:2]
    if direction == 'horizontal':
        matrix = np.float32([[1, magnitude, 0], [0, 1, 0]])
    else:
        matrix = np.float32([[1, 0, 0], [magnitude, 1, 0]])
    return cv2.warpAffine(img, matrix, (w, h), borderValue=border_value,
                          flags=interp_codes[interpolation])


def imtranslate(img, offset, direction='horizontal', border_value=0,
                interpolation='bilinear'):
    h, w = img.shape[:2]
    if direction == 'horizontal':
        matrix = np.float32([[1, 0, offset], [0, 1, 0]])
    else:
        matrix = np.float32([[1, 0, 0], [0, 1, offset]])
    return cv2.warpAffine(img, matrix, (w, h), borderValue=border_value,
                          flags=interp_codes[interpolation])


def adjust_color(img, alpha=1, beta=None, gamma=0):
    gray_img = bgr2gray(img)
    gray_img = np.tile(gray_img[..., None], [1, 1, 3])
    if beta is None:
        beta = 1 - alpha
    colored_img = cv2.addWeighted(img, alpha, gray_img, beta, gamma)
    return np.clip(colored_img, 0, 255).astype(img.dtype)


def imequalize(img):
    def _scale_channel(im, c):
        im = im[:, :, c]
        histo = np.histogram(im, 256, (0, 255))[0]
        nonzero_histo = histo[histo > 0]
        step = (np.sum(nonzero_histo) - nonzero_histo[-1]) // 255
        if not step:
            lut = np.array(range(256))
        else:
            lut = (np.cumsum(histo) + (step // 2)) // step
            lut = np.concatenate([[0], lut[:-1]], 0)
            lut[lut > 255] = 255
        return np.where(np.equal(step, 0), im, lut[im])
    s1 = _scale_channel(img, 0)
    s2 = _scale_channel(img, 1)
    s3 = _scale_channel(img, 2)
    return np.stack([s1, s2, s3], axis=-1).astype(img.dtype)


def adjust_brightness(img, factor=1.0):
    degenerated = np.zeros_like(img)
    out = cv2.addWeighted(img, factor, degenerated, 1 - factor, 0)
    return np.clip(out, 0, 255).astype(img.dtype)


def adjust_contrast(img, factor=1.0):
    gray_img = bgr2gray(img)
    hist = np.histogram(gray_img, 256, (0, 255))[0]
    mean = round(np.sum(gray_img) / np.sum(hist))
    degenerated = (np.ones_like(img[..., 0]) * mean).astype(img.dtype)
    degenerated = gray2bgr(degenerated)
    out = cv2.addWeighted(img, factor, degenerated, 1 - factor, 0)
    return np.clip(out, 0, 255).astype(img.dtype)


def solarize(img, thr=128):
    return np.where(img < thr, img, 255 - img)


def posterize(img, bits):
    shift = 8 - bits
    return np.left_shift(np.right_shift(img, shift), shift)


def tensor2imgs(tensor, mean=(0, 0, 0), std=(1, 1, 1), to_rgb=True):
    num_imgs = tensor.size(0)
    mean = np.array(mean, dtype=np.float32)
    std = np.array(std, dtype=np.float32)
    imgs = []
    for img_id in range(num_imgs):
        img = tensor[img_id, ...].cpu().numpy().transpose(1, 2, 0)
        img = imdenormalize(img, mean, std, to_bgr=to_rgb).astype(np.uint8)
        imgs.append(np.ascontiguousarray(img))
    return imgs
