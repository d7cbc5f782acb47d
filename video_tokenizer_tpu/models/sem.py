"""Semantic-alignment utilities + larp_tokenizer_sem.

Re-expresses `/root/reference/models/larp_sem.py` and the alignment pieces of
`models/model_sem/` / `models/model_cnnvit/auto1.py`:
  * `SoftKMeans` (larp_sem.py:92-120): soft prototype pooling — random
    initial centers from the tokens, `iters` softmax-weighted updates.
  * `gram_matrix`, `off_diagonal`, `vicreg_pooled_loss`
    (larp_sem.py:122-165 / model_cnnvit/auto1.py:133-348): VICReg-style
    invariance + variance + covariance loss on pooled tokens.
  * `VJepaAlignerV3` (larp_sem.py:173-250): student/teacher MLP projections
    into a common dim, teacher grid trilinearly resized to the student grid
    (jax.image), SoftKMeans prototypes matched by MSE (Gram-weighted).
  * `larp_tokenizer_sem` (larp_sem.py:271+): the flagship LARPTokenizer plus
    a frozen VJEPA2 teacher and the aligner producing `align_loss` (picked up
    by the tokenizer trainer's align-loss hook with weight 0.2,
    larp_tokenizer_trainer.py:346-349).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import models
from .larp_tokenizer import LARPTokenizer
from .vfm import VJEPA2TeacherViT


class SoftKMeans(nn.Module):
    num_prototypes: int = 256
    iters: int = 5
    temp: float = 0.5
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        """x: [B, N, D] -> prototypes [B, K, D]."""
        x = x.astype(jnp.float32)
        B, N, D = x.shape
        if rng is None:
            rng = self.make_rng("kmeans") if self.has_rng("kmeans") else jax.random.PRNGKey(0)
        idx = jax.random.randint(rng, (B, self.num_prototypes), 0, N)
        c = jnp.take_along_axis(x, idx[..., None], axis=1)  # [B, K, D]

        def body(c, _):
            x2 = jnp.sum(x**2, -1, keepdims=True)  # [B,N,1]
            c2 = jnp.sum(c**2, -1)[:, None, :]  # [B,1,K]
            xc = jnp.einsum("bnd,bkd->bnk", x, c)
            dist2 = x2 + c2 - 2 * xc
            w = jax.nn.softmax(-dist2 / max(self.temp, self.eps), axis=-1)
            denom = jnp.sum(w, axis=1)[..., None] + self.eps
            return jnp.einsum("bnk,bnd->bkd", w, x) / denom, None

        c, _ = jax.lax.scan(body, c, None, length=self.iters)
        return c


def gram_matrix(tokens: jax.Array, normalize_tokens: bool = True, eps=1e-6):
    if normalize_tokens:
        tokens = tokens / (jnp.linalg.norm(tokens, axis=-1, keepdims=True) + eps)
    return jnp.einsum("bnd,bmd->bnm", tokens, tokens)


def pca_subspace_basis(tokens: jax.Array, r: int = 32, center: bool = True):
    """Top-r right-singular directions of each batch's token set.

    tokens [B, K, D] -> basis [B, D, r] (orthonormal columns). Mirrors the
    reference's SVD recipe (model_cnnvit/autoencoder.py:492-513, part of the
    commented-out softalign variant).
    """
    x = tokens
    if center:
        x = x - jnp.mean(x, axis=1, keepdims=True)
    _, _, vh = jnp.linalg.svd(x, full_matrices=False)  # vh [B, min(K,D), D]
    return jnp.swapaxes(vh[:, :r, :], 1, 2)


def _degenerate_dummy(K: int, D: int) -> jax.Array:
    """[K, D] matrix with DISTINCT singular values 1..min(K,D): a safe SVD
    input substituted for degenerate samples (see below)."""
    n = min(K, D)
    idx = jnp.arange(n)
    return jnp.zeros((K, D)).at[idx, idx].set(jnp.arange(1.0, n + 1.0))


def subspace_alignment_loss(u_tokens: jax.Array, v_tokens: jax.Array,
                            r: int = 32, var_eps: float = 1e-8) -> jax.Array:
    """Principal-subspace similarity: r - ||Bu^T Bv||_F^2, batch-averaged
    (reference model_cnnvit/autoencoder.py:516-527). Zero when the two
    r-dim subspaces coincide.

    Degenerate samples — (near-)constant token sets, e.g. clips of black
    padding frames — have coincident singular values, where the SVD JVP's
    1/(s_i^2 - s_j^2) factors are inf/NaN and one bad sample would poison
    every gradient. Such samples are swapped for a well-conditioned dummy
    BEFORE the SVD (a post-hoc `where` cannot un-NaN the cotangent) and
    masked out of the batch average."""
    ok = (
        (jnp.var(u_tokens, axis=(1, 2)) > var_eps)
        & (jnp.var(v_tokens, axis=(1, 2)) > var_eps)
    )
    du = _degenerate_dummy(*u_tokens.shape[1:])[None]
    dv = _degenerate_dummy(*v_tokens.shape[1:])[None]
    u_tokens = jnp.where(ok[:, None, None], u_tokens, du)
    v_tokens = jnp.where(ok[:, None, None], v_tokens, dv)
    bu = pca_subspace_basis(u_tokens, r=r)
    bv = pca_subspace_basis(v_tokens, r=r)
    m = jnp.einsum("bdr,bds->brs", bu, bv)
    per_sample = m.shape[1] - jnp.sum(m**2, axis=(1, 2))
    return jnp.sum(per_sample * ok) / jnp.maximum(jnp.sum(ok), 1)


def off_diagonal(x: jax.Array) -> jax.Array:
    n = x.shape[0]
    return x.reshape(-1)[:-1].reshape(n - 1, n + 1)[:, 1:].reshape(-1)


def vicreg_pooled_loss(
    s_tok, t_tok, sim_w=25.0, var_w=25.0, cov_w=1.0, eps=1e-4
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    x = jnp.mean(s_tok, axis=1)
    y = jnp.mean(t_tok, axis=1)
    sim = jnp.mean((x - y) ** 2)

    def var_term(z):
        std = jnp.sqrt(jnp.var(z, axis=0) + eps)
        return jnp.mean(jax.nn.relu(1.0 - std))

    var = var_term(x) + var_term(y)

    def cov_term(z):
        z = z - jnp.mean(z, axis=0, keepdims=True)
        B, D = z.shape
        cov = (z.T @ z) / (B - 1 + 1e-6)
        return jnp.sum(off_diagonal(cov) ** 2) / D

    cov = cov_term(x) + cov_term(y)
    total = sim_w * sim + var_w * var + cov_w * cov
    return total, {"vic_sim": sim, "vic_var": var, "vic_cov": cov}


class VJepaAlignerV3(nn.Module):
    student_dim: int
    teacher_dim: int
    student_grid: Tuple[int, int, int]
    common_dim: int = 512
    num_prototypes: int = 256
    kmeans_iters: int = 5
    kmeans_temp: float = 0.2
    gram_weight: float = 2.0

    def setup(self):
        def mlp(name):
            return nn.Sequential([
                nn.Dense(self.common_dim),
                nn.LayerNorm(),
                lambda v: nn.gelu(v, approximate=False),
                nn.Dense(self.common_dim),
            ])

        self.student_proj = mlp("student_proj")
        self.teacher_proj = mlp("teacher_proj")
        self.pool = SoftKMeans(
            num_prototypes=self.num_prototypes, iters=self.kmeans_iters,
            temp=self.kmeans_temp, name="pool",
        )

    def __call__(self, student_q, teacher_feats, teacher_grid_shape, rng=None):
        ts, hs, ws = self.student_grid
        tt, ht, wt = teacher_grid_shape
        s = self.student_proj(student_q.astype(jnp.float32))
        t = self.teacher_proj(teacher_feats.astype(jnp.float32))
        expected = tt * ht * wt
        if t.shape[1] == expected + 1:
            t = t[:, 1:]
        t = t[:, :expected]
        B, _, Dc = t.shape
        t_3d = t.reshape(B, tt, ht, wt, Dc)
        t_aligned = jax.image.resize(
            t_3d, (B, ts, hs, ws, Dc), method="trilinear"
        )
        t_tok = t_aligned.reshape(B, ts * hs * ws, Dc)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        s_proto = self.pool(s, r1)
        t_proto = self.pool(jax.lax.stop_gradient(t_tok), r2)
        gram_loss = jnp.mean((s_proto - t_proto) ** 2)
        return self.gram_weight * gram_loss, {"gram_loss": gram_loss}


@models.register("larp_tokenizer_sem")
class LARPTokenizerSem(nn.Module):
    """LARPTokenizer + frozen VJEPA2 teacher + prototype Gram alignment."""

    tokenizer_args: Dict[str, Any]
    use_vjepa_loss: bool = True
    teacher_dim: int = 1024
    teacher_depth: int = 8  # teacher size configurable; weights via converter
    teacher_heads: int = 16
    vjepa2_img_size: int = 256
    vjepa2_num_frames: int = 16
    vjepa2_patch_size: int = 16
    vjepa2_tubelet_size: int = 2
    latent_grid_shape: tuple = (4, 16, 16)
    align_common_dim: int = 256
    align_num_prototypes: int = 256
    align_kmeans_iters: int = 5
    align_kmeans_temp: float = 0.2
    align_gram_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def bottleneck_token_num(self):
        return self.tokenizer.bottleneck_token_num

    @property
    def codebook_size(self):
        return self.tokenizer.codebook_size

    @property
    def frame_num(self):
        return self.tokenizer.frame_num

    @property
    def input_size(self):
        return self.tokenizer.input_size

    def setup(self):
        self.tokenizer = LARPTokenizer(
            **{**self.tokenizer_args, "dtype": self.dtype,
               "use_pallas": self.use_pallas},
            name="tokenizer",
        )
        if self.use_vjepa_loss:
            self.teacher = VJEPA2TeacherViT(
                embed_dim=self.teacher_dim, depth=self.teacher_depth,
                num_heads=self.teacher_heads, img_size=self.vjepa2_img_size,
                num_frames=self.vjepa2_num_frames,
                patch_size=self.vjepa2_patch_size,
                tubelet_size=self.vjepa2_tubelet_size,
                out_layers=(self.teacher_depth - 1,),
                dtype=self.dtype, use_pallas=self.use_pallas,
                name="teacher_model",
            )
            self.aligner = VJepaAlignerV3(
                student_dim=self.tokenizer_args.get("decoder_hidden_size", 768),
                teacher_dim=self.teacher_dim,
                student_grid=self.latent_grid_shape,
                common_dim=self.align_common_dim,
                num_prototypes=self.align_num_prototypes,
                kmeans_iters=self.align_kmeans_iters,
                kmeans_temp=self.align_kmeans_temp,
                gram_weight=self.align_gram_weight,
                name="aligner",
            )

    def encode(self, x, train: bool = False):
        return self.tokenizer.encode(x, train=train)

    def decode(self, z):
        return self.tokenizer.decode(z)

    def decode_from_bottleneck(self, rep):
        return self.tokenizer.decode_from_bottleneck(rep)

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        out = self.tokenizer(data, train=train)
        # reference larp_sem.py computes the alignment only under
        # self.training — eval batches skip the (expensive) teacher forward
        if self.use_vjepa_loss and train:
            from .vfm import IMAGENET_MEAN, IMAGENET_STD

            B, C, T, H, W = data.shape
            s = self.vjepa2_img_size
            xt = data.astype(jnp.float32)
            if (H, W) != (s, s):
                xt = jax.image.resize(xt, (B, C, T, s, s), method="bilinear")
            xt = (xt - IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1, 1)
            taps = self.teacher(jax.lax.stop_gradient(xt))
            teacher_feats = jax.lax.stop_gradient(taps[-1])
            tg = (
                self.vjepa2_num_frames // self.vjepa2_tubelet_size,
                s // self.vjepa2_patch_size,
                s // self.vjepa2_patch_size,
            )
            # fresh SoftKMeans centers every step like the reference's
            # torch.randint; fall back to the 'vq' stream (which the
            # tokenizer trainer always provides) when no dedicated
            # 'kmeans' stream is given
            if self.has_rng("kmeans"):
                rng = self.make_rng("kmeans")
            elif self.has_rng("vq"):
                rng = jax.random.fold_in(self.make_rng("vq"), 77)
            else:
                rng = jax.random.PRNGKey(0)
            align_loss, info = self.aligner(
                out["encoded"], teacher_feats, tg, rng
            )
            # 0.5x: reference larp_sem.py:815 halves align_loss before the
            # trainer's 0.2 weight
            out["align_loss"] = 0.5 * align_loss
            out["gram_loss"] = info["gram_loss"]
        return out


def _sem_factory(**kwargs):
    """Registry entry accepting flat LARPTokenizer-style args (reference
    larp_tokenizer_sem signature) plus align_* / vjepa2_* keys."""
    sem_fields = set(LARPTokenizerSem.__dataclass_fields__) - {"tokenizer_args"}
    tok_fields = set(LARPTokenizer.__dataclass_fields__)
    sem_args = {k: v for k, v in kwargs.items() if k in sem_fields}
    tok_args = {k: v for k, v in kwargs.items() if k in tok_fields}
    return LARPTokenizerSem(tokenizer_args=tok_args, **sem_args)


models.update({"larp_tokenizer_sem": _sem_factory})
