"""Reconstruction FVD evaluator.

Re-expresses `/root/reference/eval/rfvd_evaluator.py`: encode->decode per
batch (prefers encode_eval/decode_eval with PE truncation, supports
repeat-to-16 for short clips), accumulating MSE/PSNR/LPIPS and I3D
FeatureStats of reconstructions vs reals; final FVD via the Fréchet distance
(rfvd_evaluator.py:86-154).
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from video_tokenizer_tpu.data.loader import make_loader
from video_tokenizer_tpu.metrics.fvd import FeatureStats, FVDCalculator
from video_tokenizer_tpu.models.lpips import LPIPS
from video_tokenizer_tpu.utils import common


class UCFrFVDEvaluator:
    def __init__(
        self,
        model,
        params,
        dataset,
        batch_size: int = 16,
        num_workers: int = 0,
        i3d_weights: Optional[str] = None,
        lpips_params=None,
        repeat_to_16_frames: bool = False,
        compute_fvd: bool = True,
    ):
        self.model = model
        self.params = params
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.repeat_to_16_frames = repeat_to_16_frames
        self.compute_fvd = compute_fvd
        self.fvd = FVDCalculator(i3d_weights) if compute_fvd else None
        self.lpips = LPIPS()
        if lpips_params is None:
            d = jnp.zeros((1, 3, 32, 32))
            lpips_params = self.lpips.init(jax.random.PRNGKey(0), d, d)
        self.lpips_params = lpips_params
        self._recon = jax.jit(self._recon_impl)
        self._lpips_fn = jax.jit(
            lambda p, a, b: jnp.mean(self.lpips.apply(p, a, b, normalize=True))
        )

    def _recon_impl(self, params, x):
        enc = self.model.apply(params, x, method=self.model.encode_eval)
        rec = self.model.apply(
            params, enc["encoded"], enc["num_x_tokens"],
            method=self.model.decode_eval,
        )
        return jnp.clip(rec.astype(jnp.float32), 0.0, 1.0)

    def evaluate(self, max_batches: Optional[int] = None) -> Dict[str, Any]:
        loader = make_loader(
            self.dataset, self.batch_size, num_workers=self.num_workers,
            shuffle=False, num_epochs=1, drop_remainder=False,
            shard_by_process=False,
        )
        fake_stats = FeatureStats(capture_mean_cov=True)
        real_stats = FeatureStats(capture_mean_cov=True)
        mses, psnrs, lpipses = [], [], []
        n = 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            x = jnp.asarray(common.video_to_float(batch["gt"]))
            rec = self._recon(self.params, x)
            B = x.shape[0]
            mse = jnp.mean((rec - x).reshape(B, -1) ** 2, axis=-1)
            mses.append(np.asarray(mse))
            psnrs.append(np.asarray(common.psnr_from_mse(mse)))
            xf = x.transpose(0, 2, 1, 3, 4).reshape(-1, *x.shape[1:2], *x.shape[3:])
            rf = rec.transpose(0, 2, 1, 3, 4).reshape(-1, *x.shape[1:2], *x.shape[3:])
            # weight by batch size: the ragged final batch must not count
            # as much as a full batch in the dataset mean
            lpipses.append(
                (float(self._lpips_fn(self.lpips_params, xf, rf)), B)
            )

            x_fvd, rec_fvd = x, rec
            if self.repeat_to_16_frames and x.shape[2] < 16:
                x_fvd = common.repeat_to_m_frames(x, 16)
                rec_fvd = common.repeat_to_m_frames(rec, 16)
            if self.compute_fvd and x_fvd.shape[2] >= 10:
                fake_stats = self.fvd.get_feature_stats_for_batch(rec_fvd, fake_stats)
                real_stats = self.fvd.get_feature_stats_for_batch(x_fvd, real_stats)
            n += B

        results = {
            "num_samples": n,
            "mse": float(np.concatenate(mses).mean()) if mses else None,
            "psnr": float(np.concatenate(psnrs).mean()) if psnrs else None,
            "lpips": (
                float(
                    sum(v * b for v, b in lpipses)
                    / max(sum(b for _, b in lpipses), 1)
                )
                if lpipses else None
            ),
        }
        if fake_stats.num_items and fake_stats.num_items > 1:
            results["fvd"] = self.fvd.calculate_fvd(fake_stats, real_stats)
            results["fvd_pretrained_i3d"] = self.fvd.pretrained
        return results
