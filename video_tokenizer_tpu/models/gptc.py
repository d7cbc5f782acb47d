"""GPTC: continuous-token GPT prior (Flax).

Re-expresses `/root/reference/models/gptc.py`: Linear in-projection, learned
absolute PE, pre-LN blocks (plain causal SDPA -> Pallas flash attention),
MSE next-token objective `compute_prior_loss` with optional l2-normalization
and x/target detach (gptc.py:162-177), teacher-forced `ar_predict`
(gptc.py:179-188). Used as the learned AR prior co-trained inside tokenizer
training (loss_latent_ce).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..registry import models


@dataclasses.dataclass(frozen=True)
class GPTCConfig:
    embd_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    max_seq_len: int = 1024
    n_ind: int = 16
    n_embd: int = 1024
    n_head: int = 16
    n_layer: int = 24
    detach_x: bool = False
    detach_target: bool = True
    l2_normalized: bool = True


_init02 = nn.initializers.normal(0.02)


class GPTCBlock(nn.Module):
    config: GPTCConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        B, T, C = x.shape
        h = nn.LayerNorm(name="ln1")(x)
        q = nn.Dense(C, kernel_init=_init02, name="query")(h)
        k = nn.Dense(C, kernel_init=_init02, name="key")(h)
        v = nn.Dense(C, kernel_init=_init02, name="value")(h)
        hd = C // cfg.n_head
        q, k, v = (
            t.reshape(B, T, cfg.n_head, hd) for t in (q, k, v)
        )
        y = attention(q, k, v, causal=True).reshape(B, T, C)
        y = nn.Dense(C, kernel_init=_init02, name="proj")(y)
        y = nn.Dropout(cfg.resid_pdrop, deterministic=not train)(y)
        x = x + y
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * C, kernel_init=_init02, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, kernel_init=_init02, name="mlp_proj")(h)
        h = nn.Dropout(cfg.resid_pdrop, deterministic=not train)(h)
        return x + h


class GPTC(nn.Module):
    config: GPTCConfig

    def setup(self):
        cfg = self.config
        self.input_proj = nn.Dense(cfg.n_embd, kernel_init=_init02, name="input_proj")
        self.pos_emb = self.param(
            "pos_emb", _init02, (1, cfg.max_seq_len, cfg.n_embd)
        )
        self.drop = nn.Dropout(cfg.embd_pdrop)
        self.blocks = [
            GPTCBlock(cfg, name=f"blocks_{i}") for i in range(cfg.n_layer)
        ]
        self.ln_f = nn.LayerNorm(name="ln_f")
        self.head = nn.Dense(cfg.n_ind, kernel_init=_init02, name="head")

    def __call__(
        self, x: jax.Array, targets: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        h = self.input_proj(x)
        h = self.drop(
            h + self.pos_emb[:, : h.shape[1], :], deterministic=not train
        )
        for block in self.blocks:
            h = block(h, train=train)
        h = self.ln_f(h)
        pred = self.head(h)
        loss = None
        if targets is not None:
            loss = jnp.mean((pred - targets) ** 2)
        return pred, loss

    def compute_prior_loss(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        if cfg.l2_normalized:
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        target = x[:, 1:]
        if cfg.detach_target:
            target = jax.lax.stop_gradient(target)
        xin = x[:, :-1]
        if cfg.detach_x:
            xin = jax.lax.stop_gradient(xin)
        _, loss = self(xin, targets=target, train=train)
        return loss

    def ar_predict(self, x: jax.Array) -> jax.Array:
        xin = x[:, :-1]
        pred, _ = self(xin)
        full_pred = jnp.concatenate([xin[:, :1], pred], axis=1)
        if self.config.l2_normalized:
            full_pred = full_pred / (
                jnp.linalg.norm(full_pred, axis=-1, keepdims=True) + 1e-12
            )
        return full_pred


@models.register("gptc")
def make_gptc(**kwargs):
    """Bare 'gptc' registry name: build the config from flat kwargs (the
    class's only ctor field is `config`, so registering the class directly
    would drop every arg and fail with a missing-config TypeError)."""
    return GPTC(GPTCConfig(**kwargs))


def _gptc_zoo(n_layer, n_head, n_embd):
    def ctor(**kwargs):
        return GPTC(GPTCConfig(n_layer=n_layer, n_head=n_head, n_embd=n_embd, **kwargs))

    return ctor


GPTC_models = {
    "gptc-L": _gptc_zoo(24, 16, 1024),   # 316M
    "gptc-B": _gptc_zoo(12, 12, 768),    # 86M
    "gptc-M": _gptc_zoo(12, 8, 512),     # 38M
    "gptc-S": _gptc_zoo(12, 6, 384),     # 22M
    "gptc-XS": _gptc_zoo(6, 6, 384),     # 11M
    "gptc-XXS": _gptc_zoo(6, 4, 256),    # 5M
}
models.update(GPTC_models)
