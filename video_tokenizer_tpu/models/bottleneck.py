"""Bottleneck projections + latent regularizers (VQ / summed-KL).

Re-expresses `/root/reference/models/bottleneck.py`:
  * `Bottleneck` — in/out Linear projections (double width for KL), optional
    norms, returns {output, bottleneck_rep, projected_z, telemetry}
    (bottleneck.py:65-188).
  * `SimpleVectorQuantizer` ("vq") — L2-normalized codebook, deterministic
    argmin or stochastic softmax-of-cosine sampling with fixed/learnable
    temperature and an eval-deterministic switch (bottleneck.py:203-344).
    The distance scan runs through the fused Pallas kernel (`ops.vq`);
    stochastic sampling uses Gumbel-max (distributionally identical to
    torch.multinomial over the softmax). Codebook math stays fp32 inside a
    bf16 program, mirroring the reference's forced-fp32 autocast exclusion
    (bottleneck.py:252-262).
  * `SummedKLDivergenceRegularizer` ("skl") — LDM-style summed KL
    (bottleneck.py:347-377).
  * `entropy_loss` (bottleneck.py:12-33).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.vq import vq_lookup
from ..registry import models


def entropy_loss(affinity: jax.Array, loss_type: str = "softmax", temperature: float = 0.01):
    """Sample-entropy minus codebook-entropy of softmaxed affinities."""
    flat = affinity.reshape(-1, affinity.shape[-1]) / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    if loss_type == "softmax":
        target_probs = probs
    elif loss_type == "argmax":
        codes = jnp.argmax(flat, axis=-1)
        onehots = jax.nn.one_hot(codes, flat.shape[-1], dtype=flat.dtype)
        target_probs = probs - jax.lax.stop_gradient(probs - onehots)
    else:
        raise ValueError(f"Entropy loss {loss_type} not supported")
    avg_probs = jnp.mean(target_probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(target_probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy, sample_entropy, avg_entropy


def _kaiming_uniform_torch(key, shape, dtype=jnp.float32):
    """torch nn.init.kaiming_uniform_ (a=0, fan_in, leaky_relu): U(+-sqrt(6/fan_in))."""
    fan_in = shape[-1]
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@models.register("vq")
class SimpleVectorQuantizer(nn.Module):
    dim: int
    codebook_size: int
    commitment_loss_weight: float = 0.25
    entropy_loss_weight: float = 0.0
    entropy_loss_temperature: float = 0.01
    l2_normalized: bool = False
    stochastic: bool = False
    stochastic_temperature: float = 1.0
    codebook_loss_weight: float = 1.0
    # DELIBERATE deviation: the reference defaults to STOCHASTIC eval
    # (bottleneck.py:228, eval_deterministic=False) and opts into argmax via
    # set_eval_deterministic / the eval CLI's --det. Here deterministic eval
    # is the default so every eval/serving call site works without a 'vq'
    # RNG; every flow whose numbers matter (golden eval, AR encode) uses
    # --det in the reference anyway. Set eval_deterministic=False to get
    # the reference's stochastic training-time eval telemetry.
    eval_deterministic: bool = True
    token_nums: int = 0  # accepted for registry-arg compat; unused

    def setup(self):
        if self.stochastic and not self.l2_normalized:
            # reference bottleneck.py:274-276 asserts this: the stochastic
            # softmax and the deterministic argmax both assume cosine
            # scores from pre-normalized z/emb — raw dot products would
            # bias sampling toward large-norm codes
            raise ValueError("stochastic VQ sampling requires l2_normalized")
        self.embedding = self.param(
            "embedding", _kaiming_uniform_torch, (self.codebook_size, self.dim)
        )
        if self.stochastic and self.stochastic_temperature <= 0:
            # learnable inverse temperature (reference bottleneck.py:235)
            self.stochastic_temperature_inv = self.param(
                "stochastic_temperature_inv",
                lambda key: jnp.asarray(10.0, jnp.float32),
            )
        else:
            self.stochastic_temperature_inv = (
                1.0 / self.stochastic_temperature if self.stochastic else 1.0
            )

    def get_emb(self) -> jax.Array:
        emb = jnp.asarray(self.embedding, jnp.float32)
        if self.l2_normalized:
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        return emb

    def __call__(self, z: jax.Array, train: bool = False) -> Dict[str, Any]:
        z = z.astype(jnp.float32)
        assert z.ndim == 3, "Input shape must be (batch, n_tokens, e_dim)"
        if self.l2_normalized:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        emb = self.get_emb()

        sample_stochastic = self.stochastic and (
            train or not self.eval_deterministic
        )
        if self.stochastic:
            key = (
                self.make_rng("vq")
                if sample_stochastic
                else jax.random.PRNGKey(0)
            )
            inv_t = self.stochastic_temperature_inv
            if isinstance(inv_t, jax.Array):
                # learnable temperature: fold into z so the Pallas kernel sees
                # pre-scaled logits (it takes a static inv_temp).
                q_indices = vq_lookup(
                    z * jax.lax.stop_gradient(inv_t), emb, metric="cos",
                    stochastic=sample_stochastic, inv_temp=1.0, key=key,
                )
            else:
                q_indices = vq_lookup(
                    z, emb, metric="cos",
                    stochastic=sample_stochastic,
                    inv_temp=float(inv_t), key=key,
                )
        else:
            q_indices = vq_lookup(z, emb, metric="l2")

        quantized = jnp.take(emb, q_indices, axis=0)

        loss_commit = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2)
        loss_codebook = jnp.mean((quantized - jax.lax.stop_gradient(z)) ** 2)

        if self.entropy_loss_weight > 0:
            d = (
                jnp.sum(z.reshape(-1, self.dim) ** 2, axis=1, keepdims=True)
                + jnp.sum(emb**2, axis=1)[None, :]
                - 2.0 * z.reshape(-1, self.dim) @ emb.T
            )
            loss_entropy, sample_entropy, avg_entropy = entropy_loss(
                -d, temperature=self.entropy_loss_temperature
            )
        else:
            loss_entropy = sample_entropy = avg_entropy = jnp.asarray(0.0)

        loss = (
            self.commitment_loss_weight * loss_commit
            + self.codebook_loss_weight * loss_codebook
            + self.entropy_loss_weight * loss_entropy
        )
        # straight-through estimator
        quantized = z + jax.lax.stop_gradient(quantized - z)

        return {
            "unregularized_z": z,
            "emb": emb,
            "regularized_z": quantized,
            "bottleneck_rep": q_indices,
            "loss_q": loss,
            "loss_commit": loss_commit,
            "loss_codebook": loss_codebook,
            "loss_entropy": loss_entropy,
            "per_sample_entropy": sample_entropy,
            "codebook_entropy": avg_entropy,
        }

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.get_emb(), indices, axis=0)

    def decode(self, indices: jax.Array) -> jax.Array:
        return self.get_codebook_entry(indices)


@models.register("skl")
class SummedKLDivergenceRegularizer(nn.Module):
    """Diagonal-Gaussian KL regularizer; input is (mean, logvar) interleaved."""

    dim: int
    token_nums: int = 0

    def __call__(self, z: jax.Array, train: bool = False) -> Dict[str, Any]:
        assert z.shape[-1] == self.dim * 2
        mean, logvar = z[..., ::2], z[..., 1::2]
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        var = jnp.exp(logvar)
        noise = jax.random.normal(self.make_rng("vq"), mean.shape, mean.dtype)
        z_sampled = mean + std * noise
        loss_kl = 0.5 * (mean**2 + var - 1.0 - logvar)
        loss_kl = jnp.mean(jnp.sum(loss_kl.reshape(loss_kl.shape[0], -1), axis=1))
        return {
            "regularized_z": z_sampled,
            "bottleneck_rep": mean,
            "loss_kl": loss_kl,
        }

    def decode(self, z_bottleneck: jax.Array) -> jax.Array:
        return z_bottleneck


@models.register("bottleneck")
class Bottleneck(nn.Module):
    """Linear in/out projections around a latent regularizer."""

    bottleneck_dim: int
    input_dim: int
    output_dim: int
    token_nums: int
    norm: Optional[str] = None
    regularizer: Optional[Dict[str, Any]] = None

    def setup(self):
        norm = (self.norm or "none").lower()
        self._norm = None if norm in ("no", "none") else norm
        if self.bottleneck_dim > 0:
            bdim = self.bottleneck_dim
        else:
            assert self.input_dim == self.output_dim
            bdim = self.input_dim
        self._bdim = bdim

        reg = self.regularizer
        is_kl = (
            reg is not None
            and "kl" in reg["name"].lower()
            and reg["name"].lower() not in ("vqkl",)
        )
        self.project_dim = bdim * 2 if is_kl else bdim

        if self.bottleneck_dim > 0:
            self.in_linear = nn.Dense(self.project_dim, name="in_linear")
            self.out_linear = nn.Dense(self.output_dim, name="out_linear")
        else:
            self.in_linear = self.out_linear = lambda x: x

        if self._norm in ("ln_d",):
            self.norm_layer = nn.LayerNorm()
        elif self._norm == "ln_d_na":
            self.norm_layer = nn.LayerNorm(use_bias=False, use_scale=False)
        elif self._norm == "ln_nd":
            self.norm_layer = nn.LayerNorm(
                reduction_axes=(-2, -1), feature_axes=(-2, -1)
            )
        elif self._norm in ("bn_bn", "bn_b"):
            # SyncBatchNorm equivalent (reference bottleneck.py converts BN
            # under DDP): under GSPMD jit the batch dim is logically global —
            # XLA computes the reduction over the full sharded batch, so a
            # plain BatchNorm already syncs. axis_name would be wrong here:
            # named axes only exist under shard_map/pmap, not jit.
            self.norm_layer = nn.BatchNorm(momentum=0.9)
        elif self._norm is not None:
            raise ValueError(f"Normalization type {self._norm} not supported")

        if reg is not None and reg["name"].lower() not in ("no", "none"):
            self.reg = models.make(
                reg, args={"dim": bdim, "token_nums": self.token_nums}
            )
        else:
            self.reg = None

    def project_in(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.ndim == 3
        z = self.in_linear(x)
        if self._norm is None:
            return z
        z = z.astype(jnp.float32)
        if self._norm == "bn_bn":
            return self.norm_layer(z, use_running_average=not train)
        if self._norm == "bn_b":
            b, n, d = z.shape
            z = self.norm_layer(
                z.reshape(b, n * d), use_running_average=not train
            )
            return z.reshape(b, n, d)
        return self.norm_layer(z)

    def project_out(self, z: jax.Array) -> jax.Array:
        return self.out_linear(z)

    def decode(self, bottleneck_rep: jax.Array) -> jax.Array:
        return self.project_out(self.reg.decode(bottleneck_rep))

    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, Any]:
        input_norm_first = jnp.mean(jnp.linalg.norm(x[:, 0, :], axis=-1))
        input_norm_last = jnp.mean(jnp.linalg.norm(x[:, -1, :], axis=-1))
        z = self.project_in(x, train=train)
        projected_z = z
        if self.reg is not None:
            reg_out = dict(self.reg(z, train=train))
        else:
            reg_out = {"regularized_z": z, "bottleneck_rep": z}
        x_hat = self.project_out(reg_out["regularized_z"])
        bottleneck_rep = reg_out.pop("bottleneck_rep")
        return {
            "output": x_hat,
            "bottleneck_rep": bottleneck_rep,
            "projected_z": projected_z,
            "input_norm_first": input_norm_first,
            "input_norm_last": input_norm_last,
            **reg_out,
        }
