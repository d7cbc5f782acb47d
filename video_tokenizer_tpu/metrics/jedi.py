"""JEDi metric: video-feature MMD with a polynomial kernel.

Re-expresses `/root/reference/models/model_titok/metrics/jedi.py:48-179`
(which probes a V-JEPA model and compares feature distributions with a
polynomial-kernel MMD instead of the Fréchet assumption). Statistic parity:
degree=2, coef0=0, gamma=1/dim, BIASED estimator (plain means, diagonal
included), scaled x100 — exactly the reference's `mmd_poly(...)*100`.

The feature extractor is pluggable: pass any callable mapping videos
[B, C, T, H, W] in [0, 1] -> features [B, D] (e.g. a VJEPA2TeacherViT tap
through `make_vjepa_extractor`, or the I3D extractor). The reference's
update() takes [-1, 1] inputs and maps them to [0, 1] itself
(jedi.py:123,131-139); this framework standardizes on [0, 1] everywhere, so
the mapping lives at the caller. Without pretrained teacher weights the
metric ordering is still valid for smoke tests but not comparable to
published JEDi values.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def polynomial_kernel(x: np.ndarray, y: np.ndarray, degree=2, gamma=None,
                      coef0=0.0):
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(feats1: np.ndarray, feats2: np.ndarray,
                   degree=2) -> float:
    """Biased MMD^2 with a polynomial kernel, x100 (the reference's
    `mmd_poly(X, Y, degree=2, coef0=0) * 100`, jedi.py:150,161-179)."""
    x = np.asarray(feats1, np.float64)
    y = np.asarray(feats2, np.float64)
    if x.shape[0] < 1 or y.shape[0] < 1:
        raise ValueError("JEDi needs at least one sample on each side")
    kxx = polynomial_kernel(x, x, degree)
    kyy = polynomial_kernel(y, y, degree)
    kxy = polynomial_kernel(x, y, degree)
    return float((kxx.mean() + kyy.mean() - 2 * kxy.mean()) * 100.0)


def make_vjepa_extractor(weights_path: Optional[str] = None, **teacher_kwargs):
    """Returns (extract_fn, pretrained): mean-pooled VJEPA teacher features.
    extract_fn takes [B, C, T, H, W] videos in [0, 1]; clips shorter than
    the teacher's frames_per_clip are padded by repeating the last frame
    (reference jedi.py:114-121)."""
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
    def extract(variables, videos):
        B, C, T, H, W = videos.shape
        s = teacher.img_size
        x = jnp.clip(jnp.asarray(videos, jnp.float32), 0.0, 1.0)
        if (H, W) != (s, s):
            x = jax.image.resize(x, (B, C, T, s, s), method="bilinear")
        x = (x - IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1, 1)
        if T < teacher.num_frames:
            pad = jnp.repeat(x[:, :, -1:], teacher.num_frames - T, axis=2)
            x = jnp.concatenate([x, pad], axis=2)
        taps = teacher.apply(variables, x)
        return jnp.mean(taps[-1], axis=1)  # [B, D]

    # variables passed per call (not closed over): closing over them would
    # bake the full teacher weights into every compiled specialization
    return (lambda videos: extract(variables, videos)), pretrained


class JEDiCalculator:
    def __init__(self, extractor: Callable, degree: int = 2):
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
        if not self._gen or not self._real:
            raise ValueError(
                "JEDiCalculator.compute() before update() on both sides"
            )
        gen = np.concatenate(self._gen, axis=0)
        real = np.concatenate(self._real, axis=0)
        return polynomial_mmd(gen, real, self.degree)
