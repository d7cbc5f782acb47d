"""Shared training utilities.

Re-expresses `/root/reference/utils/common.py` minus the NCCL machinery:
logger+file+TensorBoard setup (common.py:26-45), param counting
(common.py:48-76), `Averager`/`EpochTimer` (common.py:90-126),
`repeat_to_m_frames` (common.py:205-212). The pickle-broadcast object gather
(common.py:151-202) is unnecessary under single-program SPMD — per-host
values cross via `jax.experimental.multihost_utils` when needed.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def ensure_path(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def set_logger(log_path: Optional[str] = None, name: str = "video_tokenizer_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("[%(asctime)s] %(message)s", "%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_path is not None:
        fh = logging.FileHandler(log_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def compute_num_params(params, text: bool = True):
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    if not text:
        return n
    if n >= 1e9:
        return f"{n / 1e9:.1f}B"
    if n >= 1e6:
        return f"{n / 1e6:.1f}M"
    return f"{n / 1e3:.1f}K"


class Averager:
    def __init__(self):
        self.n = 0.0
        self.v = 0.0

    def add(self, v, n=1.0):
        self.v = (self.v * self.n + float(v) * n) / (self.n + n)
        self.n += n

    def item(self):
        return self.v


class EpochTimer:
    def __init__(self, max_epoch: int):
        self.max_epoch = max_epoch
        self.epoch = 0
        self.t_start = time.time()
        self.t_last = self.t_start

    @staticmethod
    def time_text(secs: float) -> str:
        if secs >= 3600:
            return f"{secs / 3600:.1f}h"
        if secs >= 60:
            return f"{secs / 60:.1f}m"
        return f"{secs:.1f}s"

    def epoch_done(self):
        self.epoch += 1
        now = time.time()
        epoch_time = now - self.t_last
        tot_time = now - self.t_start
        est_time = tot_time / self.epoch * self.max_epoch
        self.t_last = now
        return (
            self.time_text(epoch_time),
            self.time_text(tot_time),
            self.time_text(est_time),
        )


def repeat_to_m_frames(x: jax.Array, m: int = 16, axis: int = 2) -> jax.Array:
    """Pad to m frames along `axis` by repeating the LAST frame
    (reference utils/common.py:205-212; t >= m passes through)."""
    t = x.shape[axis]
    if t >= m:
        return x
    last = jax.lax.slice_in_dim(x, t - 1, t, axis=axis)
    reps = [1] * x.ndim
    reps[axis] = m - t
    return jnp.concatenate([x, jnp.tile(last, reps)], axis=axis)


def video_to_float(x):
    """Batch video to float32 in [0,1].

    The input pipeline ships uint8 [0,255] clips (4x fewer bytes over the
    host->device link than float32); every consumer normalizes on-device
    through this helper. Float inputs pass through (cast to float32), so
    `output_dtype: float32` datasets and synthetic test batches keep working.
    Works on numpy and jax arrays alike; dtype is static under jit.
    """
    if x.dtype == np.uint8:
        return x.astype(np.float32) / np.float32(255.0)
    return x.astype(np.float32)


def psnr_from_mse(mse: jax.Array, max_val: float = 1.0) -> jax.Array:
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-10))


def to_host_scalars(tree: Dict) -> Dict[str, float]:
    return {
        k: float(v) if jnp.ndim(v) == 0 else v
        for k, v in tree.items()
    }
