"""Adaptive-token-count (STAT) family.

Re-expresses `/root/reference/models/model_stat/`:
  * Encoder = RoPE gated transformer (linear patchify, scalar mask token,
    M-RoPE) that ALSO emits per-latent-token keep-probabilities from a
    `ProbPredictor` MLP head fed through a 0.1-scaled gradient STE
    (base/blocks.py:11-93: `x.detach() + 0.1*(x - x.detach())`).
  * 3-stage schedule (autoencoder.py:69-137): 'vanilla' (keep all) ->
    'random_drop' (keep a random 800..1024 prefix) -> 'adaptive'
    (Bernoulli-STE masking of pre-quantization features). The reference's
    stage thresholds are both <0, i.e. always 'adaptive'; stage boundaries
    are configurable here.
  * pairs with the STATLoss trainer (`trainers/tokenizer_trainer_stat.py`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.rope import mrope_cos_sin
from ..registry import models
from .fsq import FSQ
from .model_new import RoPEBlockStack, get_model_dims, _trunc02


class ProbPredictor(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.embed_dim, kernel_init=_trunc02, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(1, kernel_init=_trunc02, name="fc2")(h)
        return jax.nn.sigmoid(h)


class StatEncoder(nn.Module):
    model_size: str = "base"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 3
    out_channels: int = 6
    in_grid: Sequence[int] = (16, 128, 128)
    out_tokens: int = 1280
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        grid = [g // p for g, p in zip(self.in_grid, self.patch_size)]
        pt, ph, pw = self.patch_size
        B = x.shape[0]
        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (pt p1 p2 c)",
            pt=pt, p1=ph, p2=pw,
        ).astype(self.dtype)
        tokens = nn.Dense(width, kernel_init=_trunc02, name="proj_in")(tokens)
        scale = width**-0.5
        mask = self.param(
            "mask_token", lambda k, s: scale * jax.random.normal(k, s), (1, 1, 1)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(mask.astype(tokens.dtype), (B, self.out_tokens, width)),
             tokens], axis=1,
        )
        cos, sin = mrope_cos_sin(self.out_tokens, list(grid), width // heads)
        h = RoPEBlockStack(
            width, depth, heads, mlp_ratio, style="gated", dtype=self.dtype,
            use_pallas=self.use_pallas, name="blocks",
        )(h, jnp.asarray(cos), jnp.asarray(sin))
        h = h[:, : self.out_tokens]
        # 0.1-scaled gradient STE into the prob head (blocks.py:90)
        h_for_prob = jax.lax.stop_gradient(h) + 0.1 * (h - jax.lax.stop_gradient(h))
        probs = ProbPredictor(width, name="prob_head")(h_for_prob)
        out = nn.Dense(
            self.out_channels, kernel_init=_trunc02, name="proj_out"
        )(h.astype(jnp.float32))
        return out, probs.reshape(B, self.out_tokens).astype(jnp.float32)


class AutoEncoderStat(nn.Module):
    model_size: str = "base"
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    num_latent_tokens: int = 1280
    input_size: int = 128
    frame_num: int = 16
    patch_size: tuple = (4, 8, 8)
    in_channels: int = 3
    vanilla_until_epoch: int = 0   # reference hardcodes <0 -> always adaptive
    random_drop_until_epoch: int = 0
    random_drop_range: tuple = (800, 1024)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    bottleneck: Any = None
    prior_model: Any = None

    @property
    def bottleneck_token_num(self) -> int:
        return self.num_latent_tokens

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.fsq_levels))

    def setup(self):
        self.encoder = StatEncoder(
            model_size=self.model_size,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            out_channels=len(self.fsq_levels),
            in_grid=(self.frame_num, self.input_size, self.input_size),
            out_tokens=self.num_latent_tokens,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="encoder",
        )
        self.quantize = FSQ(self.fsq_levels)
        from .model_new import RoPEDecoder

        self.decoder = RoPEDecoder(
            model_size=self.model_size,
            patch_size=self.patch_size,
            in_channels=len(self.fsq_levels),
            out_channels=self.in_channels,
            in_tokens=self.num_latent_tokens,
            out_grid=(self.frame_num, self.input_size, self.input_size),
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="decoder",
        )

    def get_stage(self, current_epoch: int) -> str:
        if current_epoch < self.vanilla_until_epoch:
            return "vanilla"
        if current_epoch < self.random_drop_until_epoch:
            return "random_drop"
        return "adaptive"

    def encode(
        self, data, train: bool = False, stage: str = "adaptive"
    ) -> Dict[str, Any]:
        z, probs = self.encoder(data)
        B, N = probs.shape
        mask = jnp.ones_like(probs)
        if train:
            if stage == "random_drop":
                lo, hi = self.random_drop_range
                K = jax.random.randint(self.make_rng("stat"), (B, 1), lo, hi + 1)
                mask = (jnp.arange(N)[None, :] < K).astype(probs.dtype)
            elif stage == "adaptive":
                bern = jax.random.bernoulli(
                    self.make_rng("stat"), probs
                ).astype(probs.dtype)
                mask = probs + jax.lax.stop_gradient(bern - probs)  # STE
        else:
            if stage == "adaptive":
                mask = (probs > 0.5).astype(probs.dtype)
        z_masked = z * mask[..., None]
        x_q, info = self.quantize(z_masked)
        return {
            "encoded": x_q,
            "bottleneck_rep": info["indices"],
            "probs": probs,
            "token_mask": mask,
            "loss_q": jnp.asarray(0.0),
        }

    def decode(self, x_q):
        return self.decoder(x_q)

    def decode_from_bottleneck(self, indices):
        return self.decoder(
            self.quantize.indices_to_codes(indices).astype(jnp.float32)
        )

    decode_indices = decode_from_bottleneck  # uniform family protocol

    def __call__(self, data, train: bool = False, stage: str = "adaptive"):
        enc = self.encode(data, train=train, stage=stage)
        pred = self.decode(enc["encoded"])
        return {"pred_frames": pred, **enc}


def _factory(**overrides):
    fields = set(AutoEncoderStat.__dataclass_fields__)
    return AutoEncoderStat(
        **{k: v for k, v in overrides.items() if k in fields}
    )


models.update({"autoencoder_stat": _factory})
