"""Patch/label/latent embedding modules (Flax).

Re-expresses `/root/reference/models/embed.py`:
  * `PatchEmbed3D` (cuDNN Conv3d tubelets, embed.py:37-116) — here a
    rearrange + single Dense matmul. A stride==kernel Conv3d IS a matmul over
    flattened tubelets; writing it that way guarantees XLA tiles it onto the
    MXU as one large GEMM (B*N x (pt*p*p*C) x D) instead of relying on conv
    layout heuristics, and makes torch->jax weight porting a pure reshape.
  * `VideoPatchEmbed` (per-frame 2D patches, embed.py:16-34) — the pt=1 case.
  * `LabelEmbedder` with CFG dropout (embed.py:229-259).
  * `LatentTokenEmbedder` / `LatentContEmbedder` (embed.py:167-226).
  * `TimestepEmbedder` (embed.py:123-164).

Video tensors follow the reference's BCTHW convention at module boundaries.
"""
from __future__ import annotations

from typing import Optional

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PatchEmbed3D(nn.Module):
    """BCTHW video -> (B, t*h*w, D) tubelet tokens via one fused matmul."""

    spatial_patch_size: int = 8
    temporal_patch_size: int = 4
    embed_dim: int = 768
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, C, T, H, W = x.shape
        pt, p = self.temporal_patch_size, self.spatial_patch_size
        assert T % pt == 0 and H % p == 0 and W % p == 0, (
            f"video {x.shape} not divisible by patch ({pt},{p},{p})"
        )
        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (pt p1 p2 c)",
            pt=pt, p1=p, p2=p,
        )
        return nn.Dense(
            self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="proj",
        )(tokens.astype(self.dtype))


class VideoPatchEmbed(nn.Module):
    """Per-frame 2D patches (temporal_patch_size == 1 path)."""

    patch_size: int = 8
    embed_dim: int = 768
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        tokens = einops.rearrange(
            x, "b c t (h p1) (w p2) -> b (t h w) (p1 p2 c)", p1=p, p2=p
        )
        return nn.Dense(
            self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="proj",
        )(tokens.astype(self.dtype))


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (extra row = null class)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        train: bool = False,
        force_drop_ids: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        use_cfg = self.dropout_prob > 0
        # ALWAYS allocate the null row: CFG sampling, negative labels, and
        # force-drops all index num_classes regardless of dropout_prob —
        # with a bare num_classes-row table those lookups are out of range
        # and nn.Embed's fill mode silently returns NaN. (The reference
        # sizes the table num_classes + (dropout>0) and would crash
        # instead; one always-present row is the safe superset.)
        table = nn.Embed(
            self.num_classes + 1, self.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            name="embedding_table",
        )
        if (train and use_cfg) or force_drop_ids is not None:
            if force_drop_ids is None:
                if rng is None:
                    rng = self.make_rng("dropout")
                drop = jax.random.uniform(rng, (labels.shape[0],)) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        # negative labels -> unconditional class (reference embed.py:257)
        labels = jnp.where(labels < 0, self.num_classes, labels)
        return table(labels)


class LatentTokenEmbedder(nn.Module):
    """Discrete latent-token embedding with CFG dropout over whole sequences."""

    codebook_size: int
    hidden_size: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        train: bool = False,
        force_drop_ids: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        use_cfg = self.dropout_prob > 0
        # null row always allocated — see LabelEmbedder
        table = nn.Embed(
            self.codebook_size + 1, self.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            name="embedding_table",
        )
        if (train and use_cfg) or force_drop_ids is not None:
            if force_drop_ids is None:
                if rng is None:
                    rng = self.make_rng("dropout")
                drop = jax.random.uniform(rng, (tokens.shape[0],)) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            tokens = jnp.where(drop[:, None], self.codebook_size, tokens)
        return table(tokens)


class LatentContEmbedder(nn.Module):
    """Continuous latent embedding (Linear) with learned null embedding."""

    token_dim: int
    hidden_size: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(
        self,
        embs: jax.Array,
        train: bool = False,
        force_drop_ids: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = nn.Dense(self.hidden_size, name="embedding_map")(embs)
        # null embedding always allocated (consistent CFG contract with the
        # discrete embedders): force_drop must not silently no-op just
        # because dropout_prob == 0
        uncond = self.param(
            "uncond_embed", nn.initializers.zeros, (self.hidden_size,)
        )
        if self.dropout_prob > 0 or force_drop_ids is not None:
            if (train and self.dropout_prob > 0) or force_drop_ids is not None:
                if force_drop_ids is None:
                    if rng is None:
                        rng = self.make_rng("dropout")
                    drop = (
                        jax.random.uniform(rng, (x.shape[0],)) < self.dropout_prob
                    )
                else:
                    drop = force_drop_ids == 1
                x = jnp.where(drop[:, None, None], uncond, x)
        return x


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + MLP (reference embed.py:123-164)."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @staticmethod
    def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0):
        half = dim // 2
        freqs = jnp.exp(
            -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        x = self.timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, name="mlp_0")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, name="mlp_2")(x)
