"""JEDi metric: video-feature MMD with a polynomial kernel.

Re-expresses `/root/reference/models/model_titok/metrics/jedi.py:48-161`
(which probes a V-JEPA model and compares feature distributions with a
polynomial-kernel MMD instead of the Fréchet assumption).

The feature extractor is pluggable: pass any callable mapping videos
[B, C, T, H, W] -> features [B, D] (e.g. a VJEPA2TeacherViT tap through
`metrics.jedi.make_vjepa_extractor`, or the I3D extractor). Without
pretrained teacher weights the metric ordering is still valid for smoke
tests but not comparable to published JEDi values.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def polynomial_kernel(x: np.ndarray, y: np.ndarray, degree=3, gamma=None, coef0=1.0):
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(feats1: np.ndarray, feats2: np.ndarray, degree=3) -> float:
    """Unbiased MMD^2 estimate with a polynomial kernel (JEDi's statistic)."""
    x = np.asarray(feats1, np.float64)
    y = np.asarray(feats2, np.float64)
    m, n = x.shape[0], y.shape[0]
    kxx = polynomial_kernel(x, x, degree)
    kyy = polynomial_kernel(y, y, degree)
    kxy = polynomial_kernel(x, y, degree)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2 * sum_xy)


def make_vjepa_extractor(weights_path: Optional[str] = None, **teacher_kwargs):
    """Returns (extract_fn, pretrained): mean-pooled VJEPA teacher features."""
    import jax
    import jax.numpy as jnp

    from ..models.vfm import IMAGENET_MEAN, IMAGENET_STD, VJEPA2TeacherViT

    teacher = VJEPA2TeacherViT(**teacher_kwargs)
    pretrained = False
    if weights_path is not None:
        data = np.load(weights_path, allow_pickle=True)
        variables = {"params": jax.tree_util.tree_map(
            jnp.asarray, data["params"].item()
        )}
        pretrained = True
    else:
        dummy = jnp.zeros(
            (1, 3, teacher.num_frames, teacher.img_size, teacher.img_size)
        )
        variables = teacher.init(jax.random.PRNGKey(0), dummy)

    @jax.jit
    def extract(videos):
        B, C, T, H, W = videos.shape
        s = teacher.img_size
        x = jnp.asarray(videos, jnp.float32)
        if (H, W) != (s, s):
            x = jax.image.resize(x, (B, C, T, s, s), method="bilinear")
        x = (x - IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1, 1)
        taps = teacher.apply(variables, x)
        return jnp.mean(taps[-1], axis=1)  # [B, D]

    return extract, pretrained


class JEDiCalculator:
    def __init__(self, extractor: Callable, degree: int = 3):
        self.extractor = extractor
        self.degree = degree
        self._gen = []
        self._real = []

    def update(self, gen_videos=None, real_videos=None):
        if gen_videos is not None:
            self._gen.append(np.asarray(self.extractor(gen_videos)))
        if real_videos is not None:
            self._real.append(np.asarray(self.extractor(real_videos)))

    def compute(self) -> float:
        gen = np.concatenate(self._gen, axis=0)
        real = np.concatenate(self._real, axis=0)
        return polynomial_mmd(gen, real, self.degree)
