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
    def __call__(self, x: jax.Array, train: bool = False, lc=None, pos=None):
        """Full causal forward (lc=None), or incremental KV-cached forward:
        x is a [B, T, C] chunk whose first row sits at absolute position
        `pos` (scalar int32); lc = {'k','v': [B, S, H, D]} is this layer's
        cache, returned updated. Mirrors the reference's `layer_past` path
        (/root/reference/models/gptc.py:54-76), which nothing there calls —
        implemented here so the continuous prior can serve incrementally."""
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
        if lc is None:
            y = attention(q, k, v, causal=True).reshape(B, T, C)
        else:
            lc = dict(lc)
            for name, rows in (("k", k), ("v", v)):
                lc[name] = jax.lax.dynamic_update_slice(
                    lc[name], rows.astype(lc[name].dtype), (0, pos, 0, 0)
                )
            S = lc["k"].shape[1]
            q_pos = pos + jnp.arange(T)  # [T]
            mask = jnp.arange(S)[None, :] <= q_pos[:, None]  # [T, S]
            scores = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32),
                lc["k"].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * (hd ** -0.5)
            scores = jnp.where(mask[None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            y = jnp.einsum(
                "bhts,bshd->bthd", probs, lc["v"].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(B, T, C)
        y = nn.Dense(C, kernel_init=_init02, name="proj")(y)
        y = nn.Dropout(cfg.resid_pdrop, deterministic=not train)(y)
        x = x + y
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * C, kernel_init=_init02, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, kernel_init=_init02, name="mlp_proj")(h)
        h = nn.Dropout(cfg.resid_pdrop, deterministic=not train)(h)
        out = x + h
        if lc is None:
            return out
        return out, lc


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

    def init_cache(self, batch_size: int, max_seq_length: int,
                   dtype=jnp.float32):
        """Per-layer KV cache list for `decode_step` — the TPU-native form
        of the reference's `layer_past` tuples (gptc.py:54-76)."""
        cfg = self.config
        hd = cfg.n_embd // cfg.n_head
        return [
            {
                "k": jnp.zeros(
                    (batch_size, max_seq_length, cfg.n_head, hd), dtype
                ),
                "v": jnp.zeros(
                    (batch_size, max_seq_length, cfg.n_head, hd), dtype
                ),
            }
            for _ in range(cfg.n_layer)
        ]

    def decode_step(self, x: jax.Array, pos, cache):
        """Incremental forward: x [B, T, n_ind] chunk whose first row sits
        at absolute position `pos` (scalar int32; T=1 for plain one-token
        decode). Returns (pred [B, T, n_ind], updated cache). Equal to the
        matching slice of the full `__call__` (pinned in
        tests/test_models.py::test_gptc_incremental_decode)."""
        h = self.input_proj(x)
        T = h.shape[1]
        pe = jax.lax.dynamic_slice_in_dim(
            self.pos_emb[0], pos, T, axis=0
        )
        h = h + pe[None]
        new_cache = []
        for block, lc in zip(self.blocks, cache):
            h, lc = block(h, lc=lc, pos=pos)
            new_cache.append(lc)
        pred = self.head(self.ln_f(h))
        return pred, new_cache

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
