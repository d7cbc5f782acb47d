"""Tokenizer training losses: LPIPS + pixel + GAN with transformer discriminator.

Re-expresses `/root/reference/models/loss.py`:
  * `TransformerDiscriminator` (loss.py:119-204): patch embed + cls token +
    fused ViT + LN + linear head, 3D sin-cos PE buffer.
  * `VQLPIPSWithDiscriminator` (loss.py:207-456): L1/L2 pixel + LPIPS
    perceptual, hinge / non-saturating / ns-smooth (one-side label-smoothed)
    GAN losses, `adopt_weight` disc_start gating, LeCam EMA regularization,
    optional R1 gradient penalty (nested `jax.grad`), d_update_freq knobs.

JIT-compatibility notes:
  * `global_step` is a traced scalar; disc_start gating uses `jnp.where`.
  * LeCam EMA scalars live in a mutable "ema" variable collection.
  * ns_smooth's random label noise draws from the "gan" RNG stream.
  * The reference multiplies `lecam_weight` twice (loss.py:425,437 — weight
    applied inside and outside); we apply it once, matching the cited paper.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sincos
from ..registry import models
from .embed import PatchEmbed3D, VideoPatchEmbed
from .lpips import LPIPS
from .transformer import ViTStack


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def hinge_g_loss(logits_fake):
    return -jnp.mean(logits_fake)


def _bce_logits(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def ns_d_loss(logits_real, logits_fake):
    return _bce_logits(logits_real, jnp.ones_like(logits_real)) + _bce_logits(
        logits_fake, jnp.zeros_like(logits_fake)
    )


def ns_d_loss_single_side_smooth(logits_real, logits_fake, rng):
    r1, r2 = jax.random.split(rng)
    real_target = jnp.clip(
        1.0 - jnp.abs(jax.random.normal(r1, logits_real.shape)) * 0.15,
        min=0.7,
    )
    fake_target = jnp.clip(
        jnp.abs(jax.random.normal(r2, logits_fake.shape)) * 0.15, max=0.3
    )
    return _bce_logits(logits_real, real_target) + _bce_logits(
        logits_fake, fake_target
    )


def ns_g_loss(logits_fake):
    return -jnp.mean(jax.nn.log_sigmoid(logits_fake))


def relativistic_d_loss(logits_real, logits_fake):
    """Relativistic pairing discriminator loss (reference
    models/model/losses/loss_module.py:104-146): softplus(-(real - fake))."""
    diff = logits_real - logits_fake
    return jnp.mean(jax.nn.softplus(-diff))


def relativistic_g_loss(logits_real, logits_fake):
    diff = logits_fake - logits_real
    return jnp.mean(jax.nn.softplus(-diff))


def noise_gradient_penalty(disc_fn, x, rng, sigma: float = 0.01):
    """Finite-difference R1/R2-style penalty (loss_module.py noise-based
    variant): penalizes output change under small input noise — a cheaper,
    jit-friendly surrogate for the exact gradient penalty."""
    noise = sigma * jax.random.normal(rng, x.shape, x.dtype)
    d0 = disc_fn(jax.lax.stop_gradient(x))
    d1 = disc_fn(jax.lax.stop_gradient(x) + noise)
    return jnp.mean((d1 - d0) ** 2) / (sigma**2)


def lecam_reg(real_pred, fake_pred, ema_real_pred, ema_fake_pred):
    return jnp.mean(nn.relu(real_pred - ema_fake_pred) ** 2) + jnp.mean(
        nn.relu(ema_real_pred - fake_pred) ** 2
    )


def _power_iteration_sigma(w2d: jax.Array, n_iter: int = 9) -> jax.Array:
    """Top singular value of a 2-D matrix by power iteration.

    Stateless re-expression of torch.nn.utils.spectral_norm: instead of a
    persistent `u` buffer updated once per step, iterate from a fixed
    deterministic start every call (the discriminator kernels are tiny, so a
    few extra matvecs are free next to its forward). Gradient semantics match
    torch: u/v are detached, sigma = uᵀWv stays differentiable so the grad
    carries the -W(uvᵀ)/sigma² term that suppresses the top singular value.
    """
    v = jnp.full((w2d.shape[1],), 1.0 / jnp.sqrt(w2d.shape[1]), w2d.dtype)

    def body(_, v):
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        v = w2d.T @ u
        return v / (jnp.linalg.norm(v) + 1e-12)

    v = jax.lax.stop_gradient(jax.lax.fori_loop(0, n_iter, body, v))
    u = w2d @ v
    u = jax.lax.stop_gradient(u / (jnp.linalg.norm(u) + 1e-12))
    return u @ w2d @ v


def spectral_normalize_params(params):
    """Divide every `kernel` leaf (Dense / conv patch-embed) by its top
    singular value — the whole-module analogue of the reference's
    `apply_spectral_norm` (loss.py:59-64), which wraps every Linear/Conv
    child. Non-kernel leaves (biases, LN scales, cls_token, PE) pass through,
    matching the reference's isinstance filter."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for k, w in flat.items():
        if k[-1] == "kernel" and w.ndim >= 2:
            w2d = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
            sigma = _power_iteration_sigma(w2d)
            out[k] = (w.astype(jnp.float32) / jnp.maximum(sigma, 1e-12)).astype(
                w.dtype
            )
        else:
            out[k] = w
    return traverse_util.unflatten_dict(out)


def measure_perplexity(predicted_indices, n_embed):
    """Codebook usage perplexity + cluster count (loss.py:103-110)."""
    onehots = jax.nn.one_hot(
        predicted_indices.reshape(-1), n_embed, dtype=jnp.float32
    )
    avg_probs = onehots.mean(0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


class TransformerDiscriminator(nn.Module):
    hidden_size: int = 384
    n_heads: int = 12
    n_layers: int = 8
    input_size: int = 128
    temporal_patch_size: int = 4
    patch_size: int = 8
    in_channels: int = 3
    frame_num: int = 16
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: BCTHW -> logits [B, 1]."""
        assert x.shape[1] == self.in_channels, (
            f"discriminator built for {self.in_channels} channels, "
            f"got {x.shape[1]}"
        )
        b = x.shape[0]
        if self.temporal_patch_size == 1:
            tokens = VideoPatchEmbed(
                patch_size=self.patch_size, embed_dim=self.hidden_size,
                dtype=self.dtype, name="x_embedder",
            )(x)
            token_t = self.frame_num
        else:
            tokens = PatchEmbed3D(
                spatial_patch_size=self.patch_size,
                temporal_patch_size=self.temporal_patch_size,
                embed_dim=self.hidden_size, dtype=self.dtype,
                name="x_embedder",
            )(x)
            token_t = self.frame_num // self.temporal_patch_size
        token_hw = self.input_size // self.patch_size
        pe = jnp.asarray(
            sincos.sincos_3d(self.hidden_size, token_hw, token_t)
        ).reshape(1, -1, self.hidden_size)
        tokens = tokens + pe.astype(tokens.dtype)
        cls_token = self.param(
            "cls_token", nn.initializers.xavier_uniform(),
            (1, 1, self.hidden_size),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (b, 1, self.hidden_size)), tokens],
            axis=1,
        )
        z = ViTStack(
            self.hidden_size, self.n_layers, self.n_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, name="transformer_encoder",
        )(tokens)
        z_cls = nn.LayerNorm(epsilon=1e-6, name="norm_final")(z[:, 0])
        return nn.Dense(
            1, kernel_init=nn.initializers.xavier_uniform(), name="fc"
        )(z_cls)


@models.register("lpips_disc_loss")
class VQLPIPSWithDiscriminator(nn.Module):
    disc_start: int = 0
    disc_self_start: Optional[int] = None
    pixelloss_weight: float = 1.0
    disc_type: str = "transformer"
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"
    disc_tran_hidden_size: int = 256
    disc_tran_n_heads: int = 8
    disc_tran_n_layers: int = 6
    disc_tran_temporal_patch_size: int = 1
    disc_tran_patch_size: int = 16
    frame_num: int = 16
    perceptual_loss: str = "lpips"
    pixel_loss: str = "l1"
    lecam_weight: float = 0.0
    input_spatial_size: int = 128
    r1_gp_weight: float = 0.0
    d_update_freq: int = 1
    d_update_loss_threshold: float = -1.0e6
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    spectral_norm: bool = False

    def setup(self):
        assert self.disc_loss in ("hinge", "ns", "ns_smooth")
        assert self.pixel_loss in ("l1", "l2")
        assert self.disc_type.lower() == "transformer", self.disc_type
        assert self.perceptual_loss == "lpips", self.perceptual_loss
        self.lpips = LPIPS(dtype=self.dtype, name="perceptual")
        disc_cls = TransformerDiscriminator
        if self.spectral_norm:
            # reference loss.py:275-276 wraps every disc Linear/Conv in
            # torch spectral_norm; here the whole discriminator's kernels
            # are sigma-normalized on the way in (stateless power iteration,
            # see spectral_normalize_params)
            # init=self.is_initializing(): let the inner module CREATE its
            # params at init (the transform is shape-preserving, trans_out
            # stays identity). init must be False at apply time: with any
            # mutable collection open (e.g. the LeCam "ema"), init=True makes
            # map_variables re-run the module as an initializer against the
            # immutable params collection, which raises
            # ScopeCollectionNotFound.
            disc_cls = nn.map_variables(
                TransformerDiscriminator, "params",
                trans_in_fn=spectral_normalize_params,
                init=self.is_initializing(),
            )
        self.discriminator = disc_cls(
            hidden_size=self.disc_tran_hidden_size,
            n_heads=self.disc_tran_n_heads,
            n_layers=self.disc_tran_n_layers,
            input_size=self.input_spatial_size,
            temporal_patch_size=self.disc_tran_temporal_patch_size,
            patch_size=self.disc_tran_patch_size,
            in_channels=self.disc_in_channels,
            frame_num=self.frame_num,
            dtype=self.dtype,
            # R1 needs grad-of-grad through the discriminator; the Pallas
            # flash kernel's custom VJP is not twice-differentiable, so pin
            # the XLA attention path when the penalty is on (the disc is
            # small — the cost is negligible next to the second forward)
            use_pallas=(
                False if self.r1_gp_weight > 0.0 else self.use_pallas
            ),
            name="discriminator",
        )
        self.lecam_ema_real = self.variable(
            "ema", "lecam_ema_real", lambda: jnp.asarray(0.0)
        )
        self.lecam_ema_fake = self.variable(
            "ema", "lecam_ema_fake", lambda: jnp.asarray(0.0)
        )
        self._disc_self_start = (
            self.disc_self_start
            if self.disc_self_start is not None and self.disc_self_start >= 0
            else self.disc_start
        )

    def _pixel(self, x, y):
        return jnp.abs(x - y) if self.pixel_loss == "l1" else (x - y) ** 2

    def _frames(self, v):
        return einops.rearrange(v, "b c t h w -> (b t) c h w")

    def forward_perceptual(self, inputs, reconstructions):
        p = self.lpips(
            self._frames(inputs), self._frames(reconstructions), normalize=True
        )
        return {"loss_prior": jnp.mean(p)}

    def perceptual_per_sample(self, inputs, reconstructions):
        """Per-sample LPIPS [B] (frame-mean), for the STAT content prior."""
        B = inputs.shape[0]
        p = self.lpips(
            self._frames(inputs), self._frames(reconstructions), normalize=True
        )
        return p.reshape(B, -1).mean(axis=1)

    def generator_loss(
        self, inputs, reconstructions, global_step
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """NLL (pixel + perceptual) + adversarial generator loss."""
        input_frames = self._frames(inputs)
        recon_frames = self._frames(reconstructions)
        disc_factor = jnp.where(
            global_step >= self.disc_start, self.disc_factor, 0.0
        )

        rec_loss = (
            jnp.mean(self._pixel(input_frames, recon_frames))
            if self.pixelloss_weight > 0
            else jnp.asarray(0.0)
        )
        p_loss = (
            jnp.mean(self.lpips(input_frames, recon_frames, normalize=True))
            if self.perceptual_weight > 0
            else jnp.asarray(0.0)
        )
        nll_loss = self.pixelloss_weight * rec_loss + self.perceptual_weight * p_loss

        logits_fake = self.discriminator(reconstructions)
        if self.disc_loss == "hinge":
            g_loss = hinge_g_loss(logits_fake)
        else:
            g_loss = ns_g_loss(logits_fake)
        g_loss_weight = self.disc_weight * disc_factor
        loss = nll_loss + g_loss_weight * g_loss
        info = {
            "rec_loss": rec_loss,
            "perceptual_loss": p_loss,
            "rp_loss": nll_loss,
            "g_loss": g_loss,
            "g_loss_weight": g_loss_weight,
        }
        return loss, info

    def discriminator_loss(
        self, inputs, reconstructions, global_step, train: bool = True
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        disc_factor = jnp.where(
            global_step >= self._disc_self_start, self.disc_factor, 0.0
        )
        recon_sg = jax.lax.stop_gradient(reconstructions)

        if train and self.r1_gp_weight > 0.0:
            # ONE real-batch forward yields both the logits and the input
            # gradient (reference loss.py:37-56 likewise shares the forward)
            def disc_sum(v):
                logits = self.discriminator(v)
                return jnp.sum(logits.astype(jnp.float32)), logits

            (_, logits_real), grads = jax.value_and_grad(
                disc_sum, has_aux=True
            )(jax.lax.stop_gradient(inputs))
            r1_gp = (
                jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
                * self.r1_gp_weight
            )
        else:
            logits_real = self.discriminator(inputs)
            r1_gp = jnp.asarray(0.0)
        logits_fake = self.discriminator(recon_sg)

        if self.lecam_weight > 0.0:
            lecam_loss = self.lecam_weight * lecam_reg(
                jnp.mean(logits_real),
                jnp.mean(logits_fake),
                self.lecam_ema_real.value,
                self.lecam_ema_fake.value,
            )
            if train and not self.is_initializing():
                decay = 0.999
                self.lecam_ema_real.value = (
                    self.lecam_ema_real.value * decay
                    + jnp.mean(logits_real.astype(jnp.float32)) * (1 - decay)
                )
                self.lecam_ema_fake.value = (
                    self.lecam_ema_fake.value * decay
                    + jnp.mean(logits_fake.astype(jnp.float32)) * (1 - decay)
                )
        else:
            lecam_loss = jnp.asarray(0.0)

        if self.disc_loss == "hinge":
            d_loss = hinge_d_loss(logits_real, logits_fake)
        elif self.disc_loss == "ns":
            d_loss = ns_d_loss(logits_real, logits_fake)
        else:
            d_loss = ns_d_loss_single_side_smooth(
                logits_real, logits_fake, self.make_rng("gan")
            )

        total_loss = (d_loss + lecam_loss + r1_gp) * jnp.where(
            disc_factor > 0.0, 1.0, 0.0
        )
        info = {
            "d_total_loss": total_loss,
            "d_lecam_loss": lecam_loss,
            "d_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
        }
        if self.r1_gp_weight > 0.0:
            info["r1_gp"] = r1_gp
        return total_loss, info

    def __call__(
        self, inputs, reconstructions, global_step,
        for_discriminator: bool = False, train: bool = True,
    ):
        if for_discriminator:
            return self.discriminator_loss(
                inputs, reconstructions, global_step, train=train
            )
        return self.generator_loss(inputs, reconstructions, global_step)

    def initialize(self, inputs, reconstructions):
        """Trace both branches so `init` creates every parameter."""
        g = self.generator_loss(inputs, reconstructions, 0)
        d = self.discriminator_loss(inputs, reconstructions, 0, train=False)
        return g, d
