"""ViT transformer stacks for the tokenizer encoder/decoder (Flax).

Re-expresses `/root/reference/models/transformer.py` (timm `Block` stacks):
  * pre-LN block: x + Attn(LN(x)); x + MLP(LN(x)); MLP ratio 4, exact GELU,
    qkv without bias, out-proj with bias (timm defaults used by the reference).
  * `transformer_encoder_parallel` — concat [context ‖ query], full
    self-attention, return the last `query_length` outputs
    (transformer.py:34-70). On TPU the attention runs through the Pallas
    flash kernel (`ops.attention`).
  * `transformer_encoder_fused` (self-attn only stack, transformer.py:8-31)
    and `DEC` (plain stack, transformer.py:75-111).

Compute dtype is configurable (bf16 recommended); LayerNorm statistics are
computed in fp32 by Flax by default.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..registry import models


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="qkv",
        )(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = attention(q, k, v, use_pallas=self.use_pallas)
        out = out.reshape(B, N, C)
        return nn.Dense(
            self.dim, use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="proj",
        )(out)


class Mlp(nn.Module):
    dim: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(
            self.dim, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="fc2",
        )(x)


class ViTBlock(nn.Module):
    """Pre-LN transformer block matching timm `Block` semantics."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    norm_eps: float = 1e-5  # timm Block standalone default
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn",
        )(y)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y)
        return x


class ViTStack(nn.Module):
    dim: int
    depth: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..parallel.tp import seq_constraint

        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock)
        for i in range(self.depth):
            # Megatron-SP hook: identity unless tracing under
            # parallel.tp.sequence_parallel(mesh) — then inter-block
            # activations shard over 'model' on the sequence dim
            x = seq_constraint(block_cls(
                self.dim, self.num_heads, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"blocks_{i}",
            )(x))
        return x


@models.register("transformer_encoder_parallel")
class TransformerEncoderParallel(nn.Module):
    """[context ‖ query] full self-attention; returns query outputs."""

    dim: int
    depth: int
    n_head: int
    head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(self, context: jax.Array, query: jax.Array) -> jax.Array:
        query_length = query.shape[1]
        h = jnp.concatenate([context, query], axis=1)
        h = ViTStack(
            self.dim, self.depth, self.n_head, dtype=self.dtype,
            use_pallas=self.use_pallas, remat=self.remat, name="stack",
        )(h)
        return h[:, -query_length:, :]


@models.register("transformer_encoder_fused")
class TransformerEncoderFused(nn.Module):
    dim: int
    depth: int
    n_head: int
    head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return ViTStack(
            self.dim, self.depth, self.n_head, dtype=self.dtype,
            use_pallas=self.use_pallas, remat=self.remat, name="stack",
        )(x)


@models.register("DEC")
class DEC(nn.Module):
    """Plain self-attention stack used as an auxiliary pixel-decoder head."""

    dim: int
    depth: int
    n_head: int
    head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False

    @nn.compact
    def __call__(self, query: jax.Array) -> jax.Array:
        return ViTStack(
            self.dim, self.depth, self.n_head, dtype=self.dtype,
            use_pallas=self.use_pallas, remat=self.remat, name="stack",
        )(query)
