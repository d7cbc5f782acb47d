"""STAT tokenizer trainer: adaptive-token-count losses.

Re-expresses `/root/reference/trainers/larp_tokenizer_trainer_stat.py:28-135`:
STATLoss = content loss (1 - Pearson-correlation^2 between per-sample mean
keep-probability and per-sample LPIPS), monotonic-decrease penalty, sparsity
MSE to a per-step random target in [0.85, 0.99], and a diversity (variance)
bonus; applied when the model's stage is 'adaptive' (:438-447). The model's
forward takes the current stage (the reference passes current_epoch,
:357-362) — stage is resolved host-side per epoch and baked into the jitted
step (re-jitted on stage change, at most twice per run).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..registry import trainers
from .tokenizer_trainer import LARPTokenizerTrainer


def stat_loss(probs, lpips_scores, target_sparsity,
              lambda_content=0.1, lambda_decrease=0.01, lambda_sparse=0.01):
    """probs: [B, N]; lpips_scores: [B]; target_sparsity: scalar in [0,1]."""
    B = probs.shape[0]
    s_probs = probs.mean(axis=-1)  # [B]
    lp = jax.lax.stop_gradient(lpips_scores.astype(jnp.float32))
    lx = lp - lp.mean()
    ly = s_probs - s_probs.mean()
    denom = jnp.sqrt(jnp.sum(lx**2) * jnp.sum(ly**2)) + 1e-8
    corr = jnp.sum(lx * ly) / denom
    content_loss = 1.0 - corr**2
    content_loss = jnp.where(jnp.isnan(content_loss), 0.0, content_loss)

    sparsity_loss = jnp.mean((s_probs - target_sparsity) ** 2)
    diff = probs[:, 1:] - probs[:, :-1]
    loss_decrease = jnp.mean(jax.nn.relu(diff))
    prob_var = jnp.mean(jnp.var(probs, axis=1))
    diversity_loss = 0.0005 / (prob_var + 1e-4)

    total = (
        lambda_content * content_loss
        + lambda_decrease * loss_decrease
        + lambda_sparse * sparsity_loss
        + diversity_loss
    )
    info = {
        "loss_content": content_loss,
        "loss_decrease": loss_decrease,
        "loss_sparse": sparsity_loss,
        "diversity_loss": diversity_loss,
        "avg_tokens": jnp.mean(jnp.sum((probs > 0.5).astype(jnp.float32), -1)),
        "stat_target_sparsity": target_sparsity,
    }
    return total, info


@trainers.register("larp_tokenizer_trainer_stat")
class LARPTokenizerTrainerStat(LARPTokenizerTrainer):
    def __init__(self, cfg):
        super().__init__(cfg)
        self._stage = "adaptive"

    def _rebuild_jits(self):
        self._train_step = jax.jit(self._train_impl(), donate_argnums=(0,))
        self._eval_step = jax.jit(
            functools.partial(self._step_impl, is_train=False)
        )

    def train_epoch(self):
        stage = self.model.get_stage(self.epoch)
        if stage != self._stage:
            self._stage = stage
            self._rebuild_jits()
            self.log(f"STAT stage -> {stage}")
        return super().train_epoch()

    def _apply_model(self, params, data, train, rng, batch_stats=None):
        r_vq, r_stat = jax.random.split(rng)
        out = self.model.apply(
            {"params": params}, data, train=train, stage=self._stage,
            rngs={"vq": r_vq, "stat": r_stat},
        )
        return out, None  # stat family has no BatchNorm collections

    def _generator_extra_loss(self, diff, data, loss_params, loss_ema, rng):
        if self._stage != "adaptive" or "probs" not in diff:
            return jnp.asarray(0.0), {}
        lpips_scores = self.loss_mod.apply(
            {"params": loss_params, "ema": loss_ema},
            data, jax.lax.stop_gradient(diff["pred_frames"]),
            method=self.loss_mod.perceptual_per_sample,
        )
        target = jax.random.uniform(rng, (), minval=0.85, maxval=0.99)
        return stat_loss(diff["probs"], lpips_scores, target)
