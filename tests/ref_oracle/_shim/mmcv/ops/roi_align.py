"""Pure-torch RoIAlign matching mmcv semantics (aligned=True default)."""
import torch
import torch.nn as nn


def roi_align(input, rois, output_size, spatial_scale=1.0, sampling_ratio=0,
              pool_mode='avg', aligned=True):
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    n_rois = rois.shape[0]
    channels = input.shape[1]
    out = input.new_zeros((n_rois, channels, ph, pw))
    height, width = input.shape[2], input.shape[3]
    offset = 0.5 if aligned else 0.0
    for r in range(n_rois):
        batch_ind = int(rois[r, 0].item())
        x1 = rois[r, 1] * spatial_scale - offset
        y1 = rois[r, 2] * spatial_scale - offset
        x2 = rois[r, 3] * spatial_scale - offset
        y2 = rois[r, 4] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = roi_w.clamp(min=1.0)
            roi_h = roi_h.clamp(min=1.0)
        bin_w = roi_w / pw
        bin_h = roi_h / ph
        sr_h = sampling_ratio if sampling_ratio > 0 else int(
            torch.ceil(roi_h / ph).clamp(min=1).item())
        sr_w = sampling_ratio if sampling_ratio > 0 else int(
            torch.ceil(roi_w / pw).clamp(min=1).item())
        # sample grid: for bin (i,j), points at
        # y = y1 + (i + (iy+0.5)/sr_h) * bin_h
        iy = (torch.arange(sr_h, dtype=input.dtype) + 0.5) / sr_h
        ix = (torch.arange(sr_w, dtype=input.dtype) + 0.5) / sr_w
        ys = y1 + (torch.arange(ph, dtype=input.dtype)[:, None] +
                   iy[None, :]) * bin_h  # (ph, sr_h)
        xs = x1 + (torch.arange(pw, dtype=input.dtype)[:, None] +
                   ix[None, :]) * bin_w  # (pw, sr_w)
        ys_f = ys.reshape(-1)  # ph*sr_h
        xs_f = xs.reshape(-1)  # pw*sr_w
        # bilinear sample feature at all (y, x) pairs
        y = ys_f.clamp(min=0, max=height - 1)
        x = xs_f.clamp(min=0, max=width - 1)
        y_low = y.floor().long().clamp(max=height - 1)
        x_low = x.floor().long().clamp(max=width - 1)
        y_high = (y_low + 1).clamp(max=height - 1)
        x_high = (x_low + 1).clamp(max=width - 1)
        ly = y - y_low.to(input.dtype)
        lx = x - x_low.to(input.dtype)
        hy, hx = 1 - ly, 1 - lx
        feat = input[batch_ind]  # (C, H, W)
        v = (feat[:, y_low][:, :, x_low] * (hy[:, None] * hx[None, :]) +
             feat[:, y_low][:, :, x_high] * (hy[:, None] * lx[None, :]) +
             feat[:, y_high][:, :, x_low] * (ly[:, None] * hx[None, :]) +
             feat[:, y_high][:, :, x_high] * (ly[:, None] * lx[None, :]))
        # zero out samples outside the feature map (mmcv semantics:
        # y < -1 or y > height -> 0)
        out_of_range = ((ys_f < -1.0) | (ys_f > height))[:, None] | \
                       ((xs_f < -1.0) | (xs_f > width))[None, :]
        v = v.masked_fill(out_of_range[None], 0)
        v = v.reshape(channels, ph, sr_h, pw, sr_w)
        if pool_mode == 'avg':
            out[r] = v.mean(dim=(2, 4))
        else:
            out[r] = v.amax(dim=(2, 4))
    return out


class RoIAlign(nn.Module):
    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode='avg', aligned=True, use_torchvision=False):
        super().__init__()
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.pool_mode = pool_mode
        self.aligned = aligned

    def forward(self, input, rois):
        return roi_align(input, rois, self.output_size, self.spatial_scale,
                         self.sampling_ratio, self.pool_mode, self.aligned)
