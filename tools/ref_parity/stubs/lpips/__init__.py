"""lpips stub: zero perceptual distance (harness runs perceptual_weight=0,
and the real VGG weights are not downloadable offline)."""
import torch
import torch.nn as nn


class LPIPS(nn.Module):
    def __init__(self, net="vgg", *a, **k):
        super().__init__()
        self.net_name = net

    def forward(self, x, y, normalize=False):
        return torch.zeros(x.shape[0], 1, 1, 1, device=x.device,
                           dtype=x.dtype)
