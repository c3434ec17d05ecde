"""Functional CARAFE (content-aware upsample) — pure torch via unfold."""
import torch
import torch.nn as nn
import torch.nn.functional as F

from ..cnn import ConvModule, normal_init, xavier_init


def carafe(x, masks, kernel_size, group_size, scale_factor):
    n, c, h, w = x.shape
    oh, ow = h * scale_factor, w * scale_factor
    pad = kernel_size // 2
    # unfold neighborhoods: (N, C*k*k, H*W)
    unf = F.unfold(x, kernel_size, dilation=1, padding=pad, stride=1)
    unf = unf.view(n, c, kernel_size * kernel_size, h, w)
    # upsample neighborhoods to output grid (nearest: each output pixel
    # uses the source cell it maps to)
    unf = unf.repeat_interleave(scale_factor, dim=3)
    unf = unf.repeat_interleave(scale_factor, dim=4)  # (N,C,k*k,oh,ow)
    masks = masks.view(n, 1, kernel_size * kernel_size, oh, ow)
    out = (unf * masks).sum(dim=2)
    return out


class CARAFEPack(nn.Module):
    """Kernel-prediction + carafe reassembly (mmcv CARAFEPack API)."""

    def __init__(self, channels, scale_factor, up_kernel=5, up_group=1,
                 encoder_kernel=3, encoder_dilation=1,
                 compressed_channels=64):
        super().__init__()
        self.channels = channels
        self.scale_factor = scale_factor
        self.up_kernel = up_kernel
        self.up_group = up_group
        self.encoder_kernel = encoder_kernel
        self.encoder_dilation = encoder_dilation
        self.compressed_channels = compressed_channels
        self.channel_compressor = nn.Conv2d(channels, compressed_channels, 1)
        self.content_encoder = nn.Conv2d(
            compressed_channels,
            self.up_kernel * self.up_kernel * self.up_group *
            self.scale_factor * self.scale_factor,
            self.encoder_kernel,
            padding=int((self.encoder_kernel - 1) * self.encoder_dilation / 2),
            dilation=self.encoder_dilation, groups=1)
        self.init_weights()

    def init_weights(self):
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                xavier_init(m, distribution='uniform')
        normal_init(self.content_encoder, std=0.001)

    def kernel_normalizer(self, mask):
        mask = F.pixel_shuffle(mask, self.scale_factor)
        n, mask_c, h, w = mask.size()
        mask_channel = int(mask_c / float(self.up_kernel**2))
        mask = mask.view(n, mask_channel, -1, h, w)
        mask = F.softmax(mask, dim=2)
        mask = mask.view(n, mask_c, h, w).contiguous()
        return mask

    def feature_reassemble(self, x, mask):
        return carafe(x, mask, self.up_kernel, self.up_group,
                      self.scale_factor)

    def forward(self, x):
        compressed_x = self.channel_compressor(x)
        mask = self.content_encoder(compressed_x)
        mask = self.kernel_normalizer(mask)
        return self.feature_reassemble(x, mask)
