import torch
import torch.nn as nn
import torch.nn.functional as F

from .carafe import CARAFEPack, carafe
from .nms import batched_nms, nms, nms_match, soft_nms
from .roi_align import RoIAlign, roi_align


class _StubModule(nn.Module):
    """Instantiable import-time stub; raises only if executed."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._stub_args = (args, kwargs)

    def forward(self, *args, **kwargs):
        raise NotImplementedError(
            f'{type(self).__name__} is an import-only shim stub')


class DeformConv2d(_StubModule):
    def __init__(self, in_channels=3, out_channels=3, kernel_size=3,
                 stride=1, padding=0, dilation=1, groups=1, deform_groups=1,
                 bias=False, *args, **kwargs):
        super().__init__()
        import math
        self.in_channels = in_channels
        self.out_channels = out_channels
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        self.kernel_size = kernel_size
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.padding = (padding, padding) if isinstance(padding,
                                                        int) else padding
        self.dilation = (dilation, dilation) if isinstance(dilation,
                                                           int) else dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *kernel_size))
        nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))


class DeformConv2dPack(DeformConv2d):
    pass


class ModulatedDeformConv2d(DeformConv2d):
    pass


class ModulatedDeformConv2dPack(DeformConv2d):
    pass


class MaskedConv2d(nn.Conv2d):
    """Falls back to regular conv (mask ignored) — matches mmcv's
    CPU-eval behavior closely enough for import/instantiation."""

    def forward(self, input, mask=None):
        return super().forward(input)


class CornerPool(nn.Module):
    """Functional corner pooling (directional cummax)."""

    def __init__(self, mode):
        super().__init__()
        assert mode in ('bottom', 'left', 'right', 'top')
        self.mode = mode

    def forward(self, x):
        if self.mode == 'top':
            return x.flip(2).cummax(dim=2)[0].flip(2)
        if self.mode == 'bottom':
            return x.cummax(dim=2)[0]
        if self.mode == 'left':
            return x.flip(3).cummax(dim=3)[0].flip(3)
        return x.cummax(dim=3)[0]


class RoIPool(_StubModule):
    def __init__(self, output_size, spatial_scale=1.0):
        super().__init__()
        self.output_size = output_size
        self.spatial_scale = spatial_scale


def roi_pool(*args, **kwargs):
    raise NotImplementedError('roi_pool shim stub')


class SimpleRoIAlign(_StubModule):
    pass


def sigmoid_focal_loss(*args, **kwargs):
    raise NotImplementedError(
        'CUDA sigmoid_focal_loss unavailable in shim; reference code uses '
        'its python fallback on CPU')


class SigmoidFocalLoss(_StubModule):
    pass


def point_sample(input, points, align_corners=False, **kwargs):
    """mmcv point_sample: grid_sample at normalized [0,1] point coords."""
    add_dim = False
    if points.dim() == 3:
        add_dim = True
        points = points.unsqueeze(2)
    output = F.grid_sample(input, 2.0 * points - 1.0,
                           align_corners=align_corners, **kwargs)
    if add_dim:
        output = output.squeeze(3)
    return output


def rel_roi_point_to_rel_img_point(rois, rel_roi_points, img, spatial_scale=1.):
    if isinstance(img, tuple):
        h, w = img
    else:
        h, w = img.shape[2:]
    scale = torch.tensor([w, h], dtype=torch.float32, device=rois.device)
    scale = scale * spatial_scale
    if rois.size(1) == 5:
        rois = rois[:, 1:]
    abs_img_point = rois[:, None, 0:2] + rel_roi_points * (
        rois[:, None, 2:4] - rois[:, None, 0:2])
    return abs_img_point / scale


def deform_conv2d(*args, **kwargs):
    raise NotImplementedError('deform_conv2d shim stub')


def modulated_deform_conv2d(*args, **kwargs):
    raise NotImplementedError('modulated_deform_conv2d shim stub')


def get_onnxruntime_op_path():
    return ''
