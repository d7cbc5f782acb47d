"""DINO-feature discriminator (StyleGAN-T style).

Re-expresses `/root/reference/models/discriminators.py` (and its duplicate at
the repo root): a frozen DINO-small ViT (patch16, d=384, 12 blocks) tapped at
depths (input, 2, 5, 8, 11), each activation fed to a conv1d head —
spectral-norm 1x1 conv + residual k=9 conv block + 1-channel projection —
logits concatenated across taps (discriminators.py:183-238).

TPU notes: the CUDA fast paths (flash_attn_qkvpacked_func, fused_mlp,
dropout_add_layer_norm, discriminators.py:16-25) are simply our Pallas
flash-attention + XLA-fused MLP. The torch-hub DINO weights download
(discriminators.py:188) is replaced by a converted-npz load with a
random-init fallback (`pretrained` flag), and `BatchNormLocal` (virtual
batch 8) by GroupNorm over channels — a deterministic, mesh-friendly
normalizer with the same role. Spectral norm uses one power-iteration step
per call with the `u` vector in a mutable 'spectral' collection.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from ..registry import models


class SpectralConv1d(nn.Module):
    """1D conv (over token axis) with power-iteration spectral norm."""

    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        # x: [B, L, C]
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(-1, self.features)
        u = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        v = w @ u.value
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if update_stats and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        # detach only u/v (torch.nn.utils.spectral_norm semantics): sigma
        # stays differentiable so the gradient carries the -W(uv^T)/sigma^2
        # term that actively suppresses the top singular value
        sigma = jax.lax.stop_gradient(v) @ w @ jax.lax.stop_gradient(u_new)
        w_sn = kernel / jnp.maximum(sigma, 1e-12)
        pad = self.kernel_size // 2
        return jax.lax.conv_general_dilated(
            x, w_sn, (1,), ((pad, pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias


class _Head(nn.Module):
    dim: int
    ks: int = 9

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = SpectralConv1d(self.dim, 1, name="conv1")(x, update_stats)
        h = nn.GroupNorm(num_groups=8, name="norm1")(h)
        h = nn.leaky_relu(h, 0.2)
        r = SpectralConv1d(self.dim, self.ks, name="conv2")(h, update_stats)
        r = nn.GroupNorm(num_groups=8, name="norm2")(r)
        h = h + nn.leaky_relu(r, 0.2)
        return SpectralConv1d(1, 1, name="proj")(h, update_stats)


class FrozenDINOSmall(nn.Module):
    """DINO-small ViT returning activations at key depths (+ input embed)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    key_depths: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        """x: [B, C, H, W] in [-1, 1] -> activations list of [B, L, C]."""
        x_scale = self.param("x_scale", nn.initializers.ones, (3,))
        x_shift = self.param("x_shift", nn.initializers.zeros, (3,))
        x = x * x_scale.reshape(1, 3, 1, 1) + x_shift.reshape(1, 3, 1, 1)
        p = self.patch_size
        import einops

        tokens = einops.rearrange(
            x, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=p, p2=p
        ).astype(self.dtype)
        h = nn.Dense(self.embed_dim, name="patch_embed")(tokens)
        B, N, C = h.shape
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, N + 1, self.embed_dim),
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype), (B, 1, C)), h], axis=1
        ) + pos.astype(h.dtype)
        acts = [h.astype(jnp.float32)]
        hd = self.embed_dim // self.num_heads
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm1_{i}")(h)
            qkv = nn.Dense(3 * C, dtype=self.dtype, name=f"qkv_{i}")(y)
            q, k, v = jnp.split(qkv, 3, -1)
            L = h.shape[1]
            a = attention(
                q.reshape(B, L, self.num_heads, hd),
                k.reshape(B, L, self.num_heads, hd),
                v.reshape(B, L, self.num_heads, hd),
                use_pallas=self.use_pallas,
            ).reshape(B, L, C)
            h = h + nn.Dense(C, dtype=self.dtype, name=f"proj_{i}")(a)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm2_{i}")(h)
            y = nn.Dense(4 * C, dtype=self.dtype, name=f"fc1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            h = h + nn.Dense(C, dtype=self.dtype, name=f"fc2_{i}")(y)
            if i in self.key_depths:
                acts.append(h.astype(jnp.float32))
        return acts


@models.register("dino_disc")
class DinoDisc(nn.Module):
    depth: int = 12
    key_depths: tuple = (2, 5, 8, 11)
    ks: int = 9
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    def setup(self):
        kd = tuple(d for d in self.key_depths if d < self.depth)
        self.dino = FrozenDINOSmall(
            depth=self.depth, key_depths=kd, dtype=self.dtype,
            use_pallas=self.use_pallas, name="dino",
        )
        self.heads = [
            _Head(384, self.ks, name=f"head_{i}") for i in range(len(kd) + 1)
        ]

    def __call__(self, x_in_pm1, update_stats: bool = False) -> jax.Array:
        """x: [B, C, H, W] in [-1, 1] -> concatenated logits [B, 5L].

        The input stays DIFFERENTIABLE — the generator's adversarial
        gradient flows through the frozen DINO features (StyleGAN-T). A
        trainer using this discriminator must mask the 'dino' subtree out
        of its optimizer (freezing is an optimizer concern; an input-side
        stop_gradient would zero d(logits)/d(x) and train nothing)."""
        acts = self.dino(x_in_pm1.astype(jnp.float32))
        B = x_in_pm1.shape[0]
        outs = [
            h(a, update_stats).reshape(B, -1)
            for h, a in zip(self.heads, acts)
        ]
        return jnp.concatenate(outs, axis=1)


def load_dino_weights(variables, npz_path: str):
    """Replace the 'dino' subtree with converted DINO-S weights
    (tools/convert_dino.py). The heads stay as initialized (they train)."""
    data = np.load(npz_path, allow_pickle=True)
    dino = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
    params = dict(variables["params"])
    # the pretrained pos_embed is a 224/16=14x14 grid (+cls); bilinearly
    # interpolate it to this discriminator's token grid (StyleGAN-T does
    # the same) — otherwise any input size other than 224 fails to add
    tgt = params["dino"].get("pos_embed")
    src_pe = dino.get("pos_embed")
    if tgt is not None and src_pe is not None and tgt.shape != src_pe.shape:
        cls_tok, grid = src_pe[:, :1], src_pe[:, 1:]
        n_src = int(np.sqrt(grid.shape[1]))
        n_tgt = int(np.sqrt(tgt.shape[1] - 1))
        grid = grid.reshape(1, n_src, n_src, -1)
        grid = jax.image.resize(
            grid, (1, n_tgt, n_tgt, grid.shape[-1]), method="bilinear"
        ).reshape(1, n_tgt * n_tgt, -1)
        dino = dict(dino)
        dino["pos_embed"] = jnp.concatenate([cls_tok, grid], axis=1)
    params["dino"] = dino
    return {**variables, "params": params}
