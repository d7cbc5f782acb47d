"""Finite Scalar Quantization + Leech-lattice scalar quantizer.

Re-expresses `/root/reference/models/model_new/quantizer/fsq.py`:
  * `FSQ` (fsq.py:55-135): tanh bound -> round with STE -> renormalize to
    [-1,1]; mixed-radix `codes_to_indices` / `indices_to_codes` via cumprod
    basis. The reference forces fp32 and disables torch.compile around it;
    here quantization simply runs in fp32 inside the jitted program (XLA
    fuses the elementwise chain; there is nothing to disable).
  * `LatticeVectorQuantizer` ("sq", fsq.py:152-230): cosine-NN search over a
    (possibly frozen) codebook — e.g. the 196 560x24 normalized Leech lattice —
    with dim-summed commitment loss and entropy telemetry. The NN search runs
    through the fused Pallas lookup kernel.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.vq import vq_lookup


def round_ste(z: jax.Array) -> jax.Array:
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQ:
    """Parameter-free finite scalar quantizer over per-dim level grids."""

    def __init__(self, levels: Sequence[int]):
        self.levels = np.asarray(list(levels), dtype=np.int32)
        self.basis = np.concatenate(
            [[1], np.cumprod(self.levels[:-1])]
        ).astype(np.int32)
        self.codebook_dim = len(self.levels)
        self.codebook_size = int(np.prod(self.levels))

    @property
    def implicit_codebook(self) -> np.ndarray:
        return np.asarray(
            self.indices_to_codes(jnp.arange(self.codebook_size))
        )

    def bound(self, z: jax.Array, eps: float = 1e-3) -> jax.Array:
        half_l = (self.levels - 1) * (1 + eps) / 2
        offset = np.where(self.levels % 2 == 0, 0.5, 0.0)
        shift = np.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jax.Array) -> jax.Array:
        quantized = round_ste(self.bound(z))
        half_width = self.levels // 2
        return quantized / half_width

    def _scale_and_shift(self, zhat_normalized):
        half_width = self.levels // 2
        return zhat_normalized * half_width + half_width

    def _scale_and_shift_inverse(self, zhat):
        half_width = self.levels // 2
        return (zhat - half_width) / half_width

    def codes_to_indices(self, zhat: jax.Array) -> jax.Array:
        zhat = self._scale_and_shift(zhat)
        # mixed-radix sum in INTEGER math: a float32 accumulation loses
        # exactness above 2^24 and would collide indices for large level
        # products (e.g. eight levels of 8)
        digits = jnp.round(zhat).astype(jnp.int32)
        return jnp.sum(digits * self.basis.astype(jnp.int32), axis=-1)

    def indices_to_level_indices(self, indices: jax.Array) -> jax.Array:
        indices = indices[..., None]
        return (indices // self.basis) % self.levels

    def indices_to_codes(self, indices: jax.Array) -> jax.Array:
        return self._scale_and_shift_inverse(
            self.indices_to_level_indices(indices)
        )

    def __call__(self, z: jax.Array):
        orig_dtype = z.dtype
        z = z.astype(jnp.float32)
        codes = self.quantize(z)
        indices = self.codes_to_indices(jax.lax.stop_gradient(codes))
        return codes.astype(orig_dtype), {"indices": indices}


def leech_lattice_codebook(n_embed: int = 196_560, dim: int = 24) -> np.ndarray:
    """Generate the normalized Leech-lattice minimal-vector codebook.

    The reference loads a precomputed `.npy` from an absolute local path
    (fsq.py:153) which is not shipped; we regenerate the 196 560 minimal
    vectors of the Leech lattice deterministically when requested, or fall
    back to a seeded Gaussian shell for non-canonical sizes.
    """
    if (n_embed, dim) != (196_560, 24):
        rng = np.random.RandomState(0)
        v = rng.randn(n_embed, dim)
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    from ..utils.leech import leech_minimal_vectors

    v = leech_minimal_vectors().astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


class LatticeVectorQuantizer(nn.Module):
    """Cosine/L2 NN quantizer over an optionally frozen codebook ("sq")."""

    n_embed: int
    embed_dim: int
    l2_norm: bool = True
    beta: float = 0.25
    use_predefined_codebook: bool = True
    freeze_codebook: bool = True

    def setup(self):
        if self.use_predefined_codebook:
            init = lambda key: jnp.asarray(
                leech_lattice_codebook(self.n_embed, self.embed_dim)
            )
        else:
            init = lambda key: jax.random.uniform(
                key, (self.n_embed, self.embed_dim),
                minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed,
            )
        # Frozen codebooks are still stored as params; the trainer masks them
        # out of the optimizer (optax.masked), the JAX analogue of
        # requires_grad=False.
        self.embedding = self.param("embedding", init)

    def get_emb(self) -> jax.Array:
        emb = jnp.asarray(self.embedding, jnp.float32)
        if self.l2_norm:
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        return emb

    def __call__(self, z: jax.Array, train: bool = False) -> Dict[str, Any]:
        z = z.astype(jnp.float32)
        emb = self.get_emb()
        if self.l2_norm:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
            indices = vq_lookup(z, emb, metric="cos")
        else:
            indices = vq_lookup(z, emb, metric="l2")
        z_q = jnp.take(emb, indices, axis=0)

        # dim-summed commitment/codebook loss (reference fsq.py:207)
        loss = self.beta * jnp.mean(
            jnp.sum((jax.lax.stop_gradient(z_q) - z) ** 2, axis=-1)
        ) + jnp.mean(jnp.sum((z_q - jax.lax.stop_gradient(z)) ** 2, axis=-1))

        counts = jnp.bincount(
            indices.reshape(-1), length=self.n_embed
        ).astype(jnp.float32)
        probs = (counts + 1e-4) / jnp.sum(counts + 1e-4)
        cb_entropy = -jnp.sum(probs * jnp.log(probs))

        z_q = z + jax.lax.stop_gradient(z_q - z)
        return {
            "output": z_q,
            "bottleneck_rep": indices,
            "loss_codebook": loss,
            "codebook_entropy": cb_entropy,
        }

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.get_emb(), indices, axis=0)

    def decode(self, indices: jax.Array) -> jax.Array:
        return self.get_codebook_entry(indices)
