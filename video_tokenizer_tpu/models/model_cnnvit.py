"""CNN-ViT hybrid family: 3D-ResNet stem + RoPE transformer + FSQ.

Re-expresses `/root/reference/models/model_cnnvit/` (and its duplicate under
`models/model_sem/autoencoder.py`):
  * 3D ResNet stem (`Encoder_cnn`, base/cnnvit.py:102-192): conv_in ch=32,
    ch_mult (1,2,4,4), per-level res blocks, downsample strides
    (1,2,2)/(2,2,2)/(2,2,2) -> T/4, H/8, W/8, z_channels = transformer width;
    mirrored `Decoder_cnn` (base/cnnvit.py:195-290) with nearest-neighbor
    Upsample3D + conv.
  * CNN features flattened, latent mask tokens prepended, M-RoPE gated
    transformer (shared with model_new), FSQ bottleneck
    (base/blocks.py:18-149).
  * alignment variants (autoencoder.py:227+, auto1.py:349-760): the same
    autoencoder with a frozen VJEPA2 teacher and either SoftKMeans-Gram-only
    or Gram+VICReg pooled alignment (sem.py utilities).

Registered: autoencoder_cnnvit, autoencoder_cnnvit_align,
autoencoder_cnnvit_align1, autoencoder_cnnvit_softalign,
autoencoder_cnnvit_softalign_gramonly_vjepa2,
autoencoder_cnnvit_softalign_gram_vic_vjepa2, autoencoder_cnnvit_resnaf.
Also: ResNAF / PEG3D attention-free blocks (base/resnaf_blocks.py:9-141 —
dead code in the reference, runnable here).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.rope import mrope_cos_sin
from ..registry import models
from .fsq import FSQ
from .model_new import RoPEBlockStack, get_model_dims, _trunc02
from .sem import (
    SoftKMeans, gram_matrix, subspace_alignment_loss, vicreg_pooled_loss,
)
from .vfm import IMAGENET_MEAN, IMAGENET_STD, VJEPA2TeacherViT

# internal conv layout: [B, T, H, W, C]


class ResnetBlock3D(nn.Module):
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        h = nn.GroupNorm(num_groups=32 if x.shape[-1] % 32 == 0 else 1, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32 if out_ch % 32 == 0 else 1, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1, 1), name="nin_shortcut")(x)
        return x + h


class Downsample3D(nn.Module):
    out_channels: int
    stride: Tuple[int, int, int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3, 3), strides=self.stride, padding=1,
            name="conv",
        )(x)


class Upsample3D(nn.Module):
    scale_factor: Tuple[int, int, int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x):
        st, sh, sw = self.scale_factor
        x = jnp.repeat(jnp.repeat(jnp.repeat(x, st, 1), sh, 2), sw, 3)
        return nn.Conv(x.shape[-1], (3, 3, 3), padding=1, name="conv")(x)


class EncoderCNN(nn.Module):
    """conv_in -> 4 levels of res blocks with (1,2,2)/(2,2,2)/(2,2,2) downs."""

    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 512

    @nn.compact
    def __call__(self, x):
        strides = [(1, 2, 2), (2, 2, 2), (2, 2, 2)]
        h = nn.Conv(self.ch, (3, 3, 3), padding=1, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.ch * mult
            for j in range(self.num_res_blocks):
                h = ResnetBlock3D(out_ch, name=f"level{i}_block{j}")(h)
            if i < len(self.ch_mult) - 1:
                h = Downsample3D(out_ch, strides[i], name=f"level{i}_down")(h)
        return nn.Conv(self.z_channels, (3, 3, 3), padding=1, name="conv_out")(h)


class DecoderCNN(nn.Module):
    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        up_scales = [(1, 2, 2), (2, 2, 2), (2, 2, 2)]
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3, 3), padding=1, name="conv_in")(z)
        n = len(self.ch_mult)
        for li, i_level in enumerate(reversed(range(n))):
            out_ch = self.ch * self.ch_mult[i_level]
            for j in range(self.num_res_blocks):
                h = ResnetBlock3D(out_ch, name=f"level{li}_block{j}")(h)
            if i_level != 0:
                h = Upsample3D(
                    up_scales[n - 1 - i_level], name=f"level{li}_up"
                )(h)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3, 3), padding=1, name="conv_out")(h)


class PEG3D(nn.Module):
    """Depthwise 3x3x3 positional conv on the token grid
    (reference model_cnnvit/base/resnaf_blocks.py:9-24)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, H, W, C]
        dim = x.shape[-1]
        return nn.Conv(
            dim, (3, 3, 3), padding=1, feature_group_count=dim,
            name="ds_conv",
        )(x)


class GEGLUFeedForward(nn.Module):
    """LN -> Dense(2*inner, no bias) -> gelu(gate)*value -> Dense(dim)
    (reference resnaf_blocks.py:27-40; inner = 2/3 * mult * dim, value is
    the FIRST chunk and gate the second, per its GEGLU.forward)."""

    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        inner = int(self.mlp_ratio * (2.0 / 3.0) * dim)
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(inner * 2, use_bias=False, name="proj_in")(h)
        val, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate) * val
        return nn.Dense(dim, use_bias=False, name="proj_out")(h)


class ResNAF(nn.Module):
    """Attention-free residual stack: per layer x += PEG3D(x); x += ffd(x)
    (reference resnaf_blocks.py:43-61). Convolutional token mixing only —
    no attention, so cost is linear in the token count."""

    num_layer: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, H, W, C]
        for i in range(self.num_layer):
            x = x + PEG3D(name=f"peg{i}")(x)
            x = x + GEGLUFeedForward(self.mlp_ratio, name=f"ffd{i}")(x)
        return x


class ResNAFAutoEncoder(nn.Module):
    """Patchify -> ResNAF -> FSQ -> ResNAF -> unpatchify autoencoder.

    Mirrors the Encoder/Decoder pair in reference resnaf_blocks.py:64-141
    (linear patch embed, ResNAF trunk, linear head). NOTE: in the reference
    these blocks are dead code — every import of them is commented out and
    no registry name instantiates them — so the `autoencoder_cnnvit_resnaf`
    registration here is a completeness affordance, not a parity name.
    The latent grid IS the patch grid (frame_num/pt, size/ph, size/pw);
    there are no separate latent tokens.
    """

    model_size: str = "tiny"
    patch_size: Tuple[int, int, int] = (4, 8, 8)
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    input_size: int = 128
    frame_num: int = 16
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None  # unused (no attention); API parity
    bottleneck: Any = None
    prior_model: Any = None

    @property
    def grid(self):
        pt, ph, pw = self.patch_size
        return (
            self.frame_num // pt, self.input_size // ph,
            self.input_size // pw,
        )

    @property
    def bottleneck_token_num(self) -> int:
        return int(np.prod(self.grid))

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.fsq_levels))

    def setup(self):
        width, depth, _, mlp_ratio = get_model_dims(self.model_size)
        self._width = width
        self.enc_proj_in = nn.Dense(
            width, kernel_init=_trunc02, name="enc_proj_in"
        )
        self.enc_blocks = ResNAF(depth, mlp_ratio, name="enc_blocks")
        self.enc_proj_out = nn.Dense(
            len(self.fsq_levels), kernel_init=_trunc02, name="enc_proj_out"
        )
        self.quantize = FSQ(self.fsq_levels)
        self.dec_proj_in = nn.Dense(
            width, kernel_init=_trunc02, name="dec_proj_in"
        )
        self.dec_blocks = ResNAF(depth, mlp_ratio, name="dec_blocks")
        pt, ph, pw = self.patch_size
        self.dec_proj_out = nn.Dense(
            self.in_channels * pt * ph * pw, kernel_init=_trunc02,
            name="dec_proj_out",
        )

    def _patchify(self, x):  # [B, C, T, H, W] -> [B, t, h, w, (pt ph pw c)]
        B, C, T, H, W = x.shape
        pt, ph, pw = self.patch_size
        x = x.reshape(B, C, T // pt, pt, H // ph, ph, W // pw, pw)
        x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
        return x.reshape(B, T // pt, H // ph, W // pw, pt * ph * pw * C)

    def _unpatchify(self, x):  # inverse of _patchify
        B, t, h, w, _ = x.shape
        pt, ph, pw = self.patch_size
        x = x.reshape(B, t, h, w, pt, ph, pw, self.in_channels)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(B, self.in_channels, t * pt, h * ph, w * pw)

    def encode(self, x, train: bool = False) -> Dict[str, Any]:
        h = self._patchify(x.astype(self.dtype))
        h = self.enc_proj_in(h)
        h = self.enc_blocks(h)
        z = self.enc_proj_out(h.astype(jnp.float32))
        B = z.shape[0]
        z_tok = z.reshape(B, -1, len(self.fsq_levels))
        x_q, info = self.quantize(z_tok)
        return {
            "encoded": x_q,
            "bottleneck_rep": info["indices"],
            "loss_q": jnp.asarray(0.0),
        }

    def decode(self, x_q):
        B = x_q.shape[0]
        t, h, w = self.grid
        g = self.dec_proj_in(x_q.astype(self.dtype)).reshape(
            B, t, h, w, self._width
        )
        g = self.dec_blocks(g)
        return self._unpatchify(self.dec_proj_out(g.astype(jnp.float32)))

    def decode_from_bottleneck(self, indices):
        return self.decode(
            self.quantize.indices_to_codes(indices).astype(jnp.float32)
        )

    decode_indices = decode_from_bottleneck

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred = self.decode(enc["encoded"])
        return {"pred_frames": pred, **enc}


class CNNViTAutoEncoder(nn.Module):
    model_size: str = "base_thin"
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    num_latent_tokens: int = 1024
    input_size: int = 128
    frame_num: int = 16
    in_channels: int = 3
    cnn_ch: int = 32
    align: str = "none"  # 'none' | 'gram' | 'gram_vic' | 'softalign'
    align_pca_rank: int = 32
    teacher_dim: int = 1024
    teacher_depth: int = 8
    teacher_heads: int = 16
    vjepa2_img_size: int = 256
    vjepa2_num_frames: int = 16
    vjepa2_patch_size: int = 16
    vjepa2_tubelet_size: int = 2
    align_num_prototypes: int = 256
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

    @property
    def grid(self):
        # CNN stem: T/4, H/8, W/8 (cnnvit.py:120-131)
        return (
            self.frame_num // 4, self.input_size // 8, self.input_size // 8
        )

    def setup(self):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        self._width, self._depth, self._heads, self._mlp = (
            width, depth, heads, mlp_ratio
        )
        self.cnn_encoder = EncoderCNN(
            ch=self.cnn_ch, z_channels=width, name="cnn_encoder"
        )
        self.mask_token = self.param(
            "mask_token", lambda k, s: width**-0.5 * jax.random.normal(k, s),
            (1, 1, 1),
        )
        self.enc_blocks = RoPEBlockStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="enc_blocks",
        )
        self.enc_proj_out = nn.Dense(
            len(self.fsq_levels), kernel_init=_trunc02, name="enc_proj_out"
        )
        self.quantize = FSQ(self.fsq_levels)
        self.dec_proj_in = nn.Dense(width, kernel_init=_trunc02, name="dec_proj_in")
        self.dec_mask_token = self.param(
            "dec_mask_token",
            lambda k, s: width**-0.5 * jax.random.normal(k, s), (1, 1, 1),
        )
        self.dec_blocks = RoPEBlockStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="dec_blocks",
        )
        self.cnn_decoder = DecoderCNN(
            ch=self.cnn_ch, out_channels=self.in_channels, name="cnn_decoder"
        )
        if self.align != "none":
            self.teacher = VJEPA2TeacherViT(
                embed_dim=self.teacher_dim, depth=self.teacher_depth,
                num_heads=self.teacher_heads, img_size=self.vjepa2_img_size,
                num_frames=self.vjepa2_num_frames,
                patch_size=self.vjepa2_patch_size,
                tubelet_size=self.vjepa2_tubelet_size,
                out_layers=(self.teacher_depth - 1,), dtype=self.dtype,
                use_pallas=self.use_pallas, name="teacher_model",
            )
            self.align_proj = nn.Dense(self.teacher_dim, name="align_proj")
            self.align_pool = SoftKMeans(
                num_prototypes=self.align_num_prototypes, name="align_pool"
            )

    def _run_encoder(self, x):
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # BTHWC
        h = self.cnn_encoder(h)
        B = h.shape[0]
        feats = h.reshape(B, -1, self._width)
        mask = jnp.broadcast_to(
            self.mask_token.astype(feats.dtype),
            (B, self.num_latent_tokens, self._width),
        )
        seq = jnp.concatenate([mask, feats], axis=1)
        cos, sin = mrope_cos_sin(
            self.num_latent_tokens, list(self.grid),
            self._width // self._heads,
        )
        seq = self.enc_blocks(seq, jnp.asarray(cos), jnp.asarray(sin))
        latents = seq[:, : self.num_latent_tokens]
        return latents

    def encode(self, x, train: bool = False) -> Dict[str, Any]:
        latents = self._run_encoder(x)
        z = self.enc_proj_out(latents.astype(jnp.float32))
        x_q, info = self.quantize(z)
        return {
            "encoded": x_q,
            "bottleneck_rep": info["indices"],
            "latents": latents,
            "loss_q": jnp.asarray(0.0),
        }

    def decode(self, x_q):
        B = x_q.shape[0]
        h = self.dec_proj_in(x_q.astype(self.dtype))
        t, hh, ww = self.grid
        gs = t * hh * ww
        mask = jnp.broadcast_to(
            self.dec_mask_token.astype(h.dtype), (B, gs, self._width)
        )
        seq = jnp.concatenate([h, mask], axis=1)
        cos, sin = mrope_cos_sin(
            self.num_latent_tokens, list(self.grid),
            self._width // self._heads,
        )
        seq = self.dec_blocks(seq, jnp.asarray(cos), jnp.asarray(sin))
        pix = seq[:, self.num_latent_tokens :]
        vol = pix.reshape(B, t, hh, ww, self._width).astype(jnp.float32)
        out = self.cnn_decoder(vol)
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def decode_from_bottleneck(self, indices):
        return self.decode(
            self.quantize.indices_to_codes(indices).astype(jnp.float32)
        )

    decode_indices = decode_from_bottleneck

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred = self.decode(enc["encoded"])
        out = {"pred_frames": pred, **{k: v for k, v in enc.items() if k != "latents"}}
        # train-only like the sibling sem family: eval batches skip the
        # expensive teacher forward (reference computes under self.training)
        if self.align != "none" and train:
            B, C, T, H, W = data.shape
            s = self.vjepa2_img_size
            xt = data.astype(jnp.float32)
            if (H, W) != (s, s):
                xt = jax.image.resize(xt, (B, C, T, s, s), method="bilinear")
            xt = (xt - IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1, 1)
            teacher_feats = jax.lax.stop_gradient(
                self.teacher(jax.lax.stop_gradient(xt))[-1]
            )
            student = self.align_proj(enc["latents"].astype(jnp.float32))
            # fresh SoftKMeans centers each step; fall back to the 'vq'
            # stream the trainer always provides (a fixed PRNGKey would
            # freeze the centers for the whole run)
            if self.has_rng("kmeans"):
                rng = self.make_rng("kmeans")
            elif self.has_rng("vq"):
                rng = jax.random.fold_in(self.make_rng("vq"), 77)
            else:
                rng = jax.random.PRNGKey(0)
            r1, r2 = jax.random.split(rng)
            if self.align == "softalign":
                # commented-out reference variant
                # (model_cnnvit/autoencoder.py:600-760): L2-normalize tokens
                # before prototype pooling, align the prototype Gram
                # matrices, and add a PCA principal-subspace constraint
                # (gram_weight 1.0, pca_weight 0.2, rank 32 per its
                # defaults).
                def _norm(t):
                    return t / (
                        jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6
                    )

                s_proto = self.align_pool(_norm(student), r1)
                t_proto = self.align_pool(_norm(teacher_feats), r2)
                gram_loss = jnp.mean(
                    (gram_matrix(s_proto) - gram_matrix(t_proto)) ** 2
                )
                pca_loss = subspace_alignment_loss(
                    s_proto, t_proto, r=self.align_pca_rank
                )
                align_loss = gram_loss + 0.2 * pca_loss
                out["gram_loss"] = gram_loss
                out["pca_loss"] = pca_loss
            else:
                s_proto = self.align_pool(student, r1)
                t_proto = self.align_pool(teacher_feats, r2)
                gram_loss = jnp.mean((s_proto - t_proto) ** 2)
                align_loss = gram_loss
                out["gram_loss"] = gram_loss
                if self.align == "gram_vic":
                    vic, vic_info = vicreg_pooled_loss(
                        student, teacher_feats
                    )
                    align_loss = align_loss + 0.01 * vic
                    out.update(vic_info)
            out["align_loss"] = align_loss
        return out


def _cnnvit_factory(align="none", **kw):
    fields = set(CNNViTAutoEncoder.__dataclass_fields__)

    def factory(**overrides):
        args = dict(kw)
        args.update({k: v for k, v in overrides.items() if k in fields})
        args["align"] = align
        return CNNViTAutoEncoder(**args)

    return factory


def _resnaf_factory(**kw):
    fields = set(ResNAFAutoEncoder.__dataclass_fields__)

    def factory(**overrides):
        args = dict(kw)
        args.update({k: v for k, v in overrides.items() if k in fields})
        return ResNAFAutoEncoder(**args)

    return factory


models.update({
    "autoencoder_cnnvit": _cnnvit_factory("none"),
    "autoencoder_cnnvit_align": _cnnvit_factory("gram"),
    "autoencoder_cnnvit_align1": _cnnvit_factory("gram"),
    # reference registration is commented out
    # (model_cnnvit/autoencoder.py:640); registered here with its documented
    # config: small_thin trunk, Gram + PCA-subspace alignment.
    "autoencoder_cnnvit_softalign": _cnnvit_factory(
        "softalign", model_size="small_thin"
    ),
    "autoencoder_cnnvit_softalign_gramonly_vjepa2": _cnnvit_factory("gram"),
    "autoencoder_cnnvit_softalign_gram_vic_vjepa2": _cnnvit_factory("gram_vic"),
    # ResNAF blocks are dead code in the reference (resnaf_blocks.py is
    # never imported uncommented); exposed here as a runnable family.
    "autoencoder_cnnvit_resnaf": _resnaf_factory(),
})
