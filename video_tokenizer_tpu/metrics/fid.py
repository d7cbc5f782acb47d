"""FID: Fréchet Inception Distance over image batches.

Re-expresses `/root/reference/utils/fid/fid.py`: same FeatureStats/caching
pattern as FVD, InceptionV3 2048-d pool features (inception.py), and both
Fréchet modes — 'original' (full matrix sqrt) and 'stable' (trace-sqrt
product; our fp64 eigh implementation serves both, fid.py:60-115).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .fvd import FeatureStats, frechet_distance


class FIDCalculator:
    def __init__(self, inception_weights: Optional[str] = None):
        import os

        from .inception import InceptionFeatureExtractor

        if inception_weights is None:
            default = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "inception_weights.npz",
            )
            inception_weights = default if os.path.exists(default) else None
        self.extractor = InceptionFeatureExtractor(inception_weights)
        self.pretrained = self.extractor.pretrained

    def get_feature_stats_for_batch(self, batch, feats=None) -> FeatureStats:
        import jax.numpy as jnp

        from ..utils.common import video_to_float

        if feats is None:
            feats = FeatureStats(capture_mean_cov=True)
        if isinstance(batch, dict):
            data = batch.get("gt", batch.get("image", batch.get("video")))
            if data is None:
                raise ValueError(
                    "batch dict has none of the keys 'gt'/'image'/'video'"
                )
        else:
            data = batch
        # uint8 [0,255] pipeline batches -> [0,1] (Inception maps to [-1,1])
        data = video_to_float(jnp.asarray(data))
        if data.ndim == 5:
            # per-frame FID like the reference (utils/fid/fid.py:102-105):
            # every frame counts, b c t h w -> (b t) c h w
            b, c, t, h, w = data.shape
            data = jnp.transpose(data, (0, 2, 1, 3, 4)).reshape(b * t, c, h, w)
        feats.append(np.asarray(self.extractor(data)))
        return feats

    def calculate_fid(self, feats_gen: FeatureStats, feats_real: FeatureStats):
        mu_g, cov_g = feats_gen.get_mean_cov()
        mu_r, cov_r = feats_real.get_mean_cov()
        return frechet_distance(mu_g, cov_g, mu_r, cov_r)
