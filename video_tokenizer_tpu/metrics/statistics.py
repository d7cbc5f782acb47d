"""Scalar statistics: codebook telemetry + top-k accuracy + SSIM.

Re-expresses `/root/reference/utils/statistics.py` (kl_divergence_from_uniform
:5-20, index_usage_percentage :23-32, calculate_topk_accuracy :34-65) plus an
on-device SSIM (the reference uses torchmetrics in per-family metrics dirs).
All functions are jit-safe and return device scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def index_histogram(indices: jax.Array, codebook_size: int) -> jax.Array:
    return jnp.bincount(indices.reshape(-1), length=codebook_size).astype(jnp.float32)


def kl_divergence_from_uniform(hist: jax.Array) -> jax.Array:
    """KL(p || uniform) of an index histogram."""
    p = hist / jnp.maximum(hist.sum(), 1.0)
    k = hist.shape[0]
    return jnp.sum(jnp.where(p > 0, p * jnp.log(p * k + 1e-10), 0.0))


def index_usage_percentage(hist: jax.Array) -> jax.Array:
    return jnp.mean((hist > 0).astype(jnp.float32)) * 100.0


def perplexity(hist: jax.Array) -> jax.Array:
    p = hist / jnp.maximum(hist.sum(), 1.0)
    return jnp.exp(-jnp.sum(jnp.where(p > 0, p * jnp.log(p + 1e-10), 0.0)))


def topk_accuracy(logits: jax.Array, targets: jax.Array, ks=(1, 5)):
    """logits [..., V], targets [...]; returns dict of top-k accuracies (fp32)."""
    logits = logits.astype(jnp.float32)
    out = {}
    max_k = max(ks)
    _, topk = jax.lax.top_k(logits, max_k)
    correct = topk == targets[..., None]
    for k in ks:
        out[f"top{k}"] = jnp.mean(jnp.any(correct[..., :k], axis=-1).astype(jnp.float32))
    return out


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(
    x: jax.Array, y: jax.Array, max_val: float = 1.0,
    kernel_size: int = 11, sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over a batch of images [B, C, H, W] (or [B, H, W, C])."""
    if x.shape[1] <= 4 and x.shape[-1] > 4:  # NCHW -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))
        y = jnp.transpose(y, (0, 2, 3, 1))
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    kern = _gaussian_kernel(kernel_size, sigma)
    c = x.shape[-1]
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(v):
        return jax.lax.conv_general_dilated(
            v, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_x = filt(x)
    mu_y = filt(y)
    mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
    sig_x = filt(x * x) - mu_x2
    sig_y = filt(y * y) - mu_y2
    sig_xy = filt(x * y) - mu_xy
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    ssim_map = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    )
    return jnp.mean(ssim_map)


def video_ssim(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Mean SSIM over videos [B, C, T, H, W] treating frames as images."""
    b, c, t, h, w = x.shape
    xf = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    yf = y.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    return ssim(xf, yf, max_val=max_val)
