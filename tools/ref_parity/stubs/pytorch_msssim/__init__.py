"""Gaussian SSIM matching pytorch_msssim.ssim defaults (11x11, sigma 1.5).

Telemetry-only in the parity harness (the reference trainer logs it; it is
not part of any loss)."""
import torch
import torch.nn.functional as F


def _gaussian_window(size=11, sigma=1.5, device=None, dtype=None):
    x = torch.arange(size, device=device, dtype=dtype) - (size - 1) / 2.0
    g = torch.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] @ g[None, :]


def ssim(X, Y, data_range=255, size_average=True, win_size=11,
         win_sigma=1.5, K=(0.01, 0.03), nonnegative_ssim=False):
    C = X.shape[1]
    win = _gaussian_window(win_size, win_sigma, X.device, X.dtype)
    win = win.expand(C, 1, win_size, win_size)
    k1, k2 = K
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = F.conv2d(X, win, groups=C)
    mu_y = F.conv2d(Y, win, groups=C)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sx = F.conv2d(X * X, win, groups=C) - mu_x2
    sy = F.conv2d(Y * Y, win, groups=C) - mu_y2
    sxy = F.conv2d(X * Y, win, groups=C) - mu_xy

    cs = (2 * sxy + c2) / (sx + sy + c2)
    m = ((2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)) * cs
    if nonnegative_ssim:
        m = torch.relu(m)
    return m.mean() if size_average else m.mean(dim=(1, 2, 3))


def ms_ssim(*a, **k):
    raise NotImplementedError("ms_ssim not needed by the parity harness")
