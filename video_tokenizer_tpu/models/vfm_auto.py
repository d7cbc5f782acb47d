"""Teacher-feature-space autoencoders (autoencoder_vfm* family).

Re-expresses `/root/reference/models/model_sem/auto1.py` (registrations at
:375, :586, :763, :920, :1072): instead of tokenizing pixels, these models
tokenize the FROZEN VJEPA2 teacher's feature space —
  teacher feats [B, 2048, 1280]
    -> TokenizerEncoder1D (RoPE gated stack over [latent masks ‖ teacher
       tokens], grid (8,16,16)) -> 1024 x 6-d latents
    -> FSQ[8,8,8,5,5,5]
    -> TokenizerDecoder1D (reconstruct the 2048 teacher-space tokens)
    -> pixel decoder head -> video,
with a teacher-feature reconstruction loss (cosine + MSE, exposed as
`align_loss`) alongside the pixel loss.

Variant mapping (conscious re-expression of auto1.py's five near-duplicate
classes): 'autoencoder_vfm' = gated multi-layer fusion; 'autoencoder_vfm1' =
pyramid fusion; 'autoencoder_vfm2' = last-layer features; the
'_fianllayer' pair uses last-layer features with ('' = FSQ, '_noquant' = no
quantizer).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.rope import mrope_cos_sin
from ..registry import models
from .fsq import FSQ
from .model_new import RoPEBlockStack, get_model_dims, _trunc02
from .vfm import (
    GatedLinearLayerFusion,
    SemanticPyramidFusion,
    VJEPA2TeacherViT,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .larp_tokenizer import OutputLayer
from .transformer import ViTStack


class Tokenizer1D(nn.Module):
    """[query masks ‖ tokens] RoPE stack; slice queries (enc) or tokens (dec)."""

    model_size: str = "base"
    in_dim: int = 1280
    out_dim: int = 6
    num_queries: int = 1024
    num_tokens: int = 2048
    grid: tuple = (8, 16, 16)
    take: str = "queries"  # 'queries' (encoder) | 'tokens' (decoder)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        B = x.shape[0]
        h = nn.Dense(width, kernel_init=_trunc02, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        scale = width**-0.5
        mask = self.param(
            "mask_token", lambda k, s: scale * jax.random.normal(k, s), (1, 1, 1)
        )
        n_mask = self.num_queries if self.take == "queries" else self.num_tokens
        masked = jnp.broadcast_to(mask.astype(h.dtype), (B, n_mask, width))
        if self.take == "queries":
            seq = jnp.concatenate([masked, h], axis=1)
            n_1d = self.num_queries
        else:
            seq = jnp.concatenate([h, masked], axis=1)
            n_1d = self.num_queries
        cos, sin = mrope_cos_sin(n_1d, list(self.grid), width // heads)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        seq = RoPEBlockStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="blocks",
        )(seq, cos[: seq.shape[1]], sin[: seq.shape[1]])
        if self.take == "queries":
            out = seq[:, : self.num_queries]
        else:
            out = seq[:, self.num_queries :]
        return nn.Dense(
            self.out_dim, kernel_init=_trunc02, name="proj_out"
        )(out.astype(jnp.float32))


class TeacherSpaceAutoEncoder(nn.Module):
    fusion: str = "gated"  # 'gated' | 'pyramid' | 'concat' | 'last'
    use_quantizer: bool = True
    model_size: str = "base"
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    num_latent_tokens: int = 1024
    teacher_dim: int = 1280
    teacher_depth: int = 32
    teacher_heads: int = 16
    vjepa2_img_size: int = 256
    vjepa2_num_frames: int = 16
    vjepa2_patch_size: int = 16
    vjepa2_tubelet_size: int = 2
    out_layers: tuple = (8, 16, 24, 31)
    pixel_dec_width: int = 768
    pixel_dec_depth: int = 8
    pixel_dec_heads: int = 12
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    bottleneck: Any = None
    prior_model: Any = None

    @property
    def teacher_tokens(self) -> int:
        return (
            (self.vjepa2_num_frames // self.vjepa2_tubelet_size)
            * (self.vjepa2_img_size // self.vjepa2_patch_size) ** 2
        )

    @property
    def vfm_grid(self):
        return (
            self.vjepa2_num_frames // self.vjepa2_tubelet_size,
            self.vjepa2_img_size // self.vjepa2_patch_size,
            self.vjepa2_img_size // self.vjepa2_patch_size,
        )

    @property
    def bottleneck_token_num(self) -> int:
        return self.num_latent_tokens

    @property
    def frame_num(self) -> int:
        """Trainer-facing clip geometry (tokenizer_trainer.py:89,
        ar_trainer.py:115 read these at init)."""
        return self.vjepa2_num_frames

    @property
    def input_size(self) -> int:
        return self.vjepa2_img_size

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.fsq_levels))

    def setup(self):
        self.teacher = VJEPA2TeacherViT(
            embed_dim=self.teacher_dim, depth=self.teacher_depth,
            num_heads=self.teacher_heads, img_size=self.vjepa2_img_size,
            num_frames=self.vjepa2_num_frames,
            patch_size=self.vjepa2_patch_size,
            tubelet_size=self.vjepa2_tubelet_size,
            out_layers=self.out_layers, dtype=self.dtype,
            use_pallas=self.use_pallas, name="teacher_model",
        )
        if self.fusion == "gated":
            self.fusion_proj = GatedLinearLayerFusion(
                self.teacher_dim, len(self.out_layers), name="fusion_proj"
            )
        elif self.fusion == "pyramid":
            self.fusion_proj = SemanticPyramidFusion(
                self.teacher_dim, self.vfm_grid, name="fusion_proj"
            )
        elif self.fusion == "concat":
            from .vfm import ConcatLayerFusion

            self.fusion_proj = ConcatLayerFusion(
                self.teacher_dim, len(self.out_layers), name="fusion_proj"
            )
        token_size = len(self.fsq_levels)
        self.tokenizer_encoder = Tokenizer1D(
            model_size=self.model_size, in_dim=self.teacher_dim,
            out_dim=token_size, num_queries=self.num_latent_tokens,
            num_tokens=self.teacher_tokens, grid=self.vfm_grid,
            take="queries", dtype=self.dtype, use_pallas=self.use_pallas,
            name="tokenizer_encoder",
        )
        if self.use_quantizer:
            self.quantize = FSQ(self.fsq_levels)
        self.tokenizer_decoder = Tokenizer1D(
            model_size=self.model_size, in_dim=token_size,
            out_dim=self.teacher_dim, num_queries=self.num_latent_tokens,
            num_tokens=self.teacher_tokens, grid=self.vfm_grid,
            take="tokens", dtype=self.dtype, use_pallas=self.use_pallas,
            name="tokenizer_decoder",
        )
        d = self.pixel_dec_width
        self.dec_to_decimage = nn.Dense(d, name="dec_to_decimage")
        self.pixel_decoder = ViTStack(
            d, self.pixel_dec_depth, self.pixel_dec_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, name="pixel_decoder",
        )
        pt, p = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        self.final_layer = OutputLayer(pt * p * p * 3, name="final_layer")

    def _teacher_feats(self, x):
        B, C, T, H, W = x.shape
        s = self.vjepa2_img_size
        xt = x.astype(jnp.float32)
        if (H, W) != (s, s):
            xt = jax.image.resize(xt, (B, C, T, s, s), method="bilinear")
        xt = (xt - IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1, 1)
        # stop_gradient on the TAPS freezes the teacher (input-side alone
        # does not cut parameter gradients — see vfm.py:_extract_vfm_features)
        taps = [
            jax.lax.stop_gradient(t)
            for t in self.teacher(jax.lax.stop_gradient(xt))
        ]
        if self.fusion in ("gated", "pyramid", "concat"):
            return self.fusion_proj(taps)
        return taps[-1]

    def encode(self, x, train: bool = False) -> Dict[str, Any]:
        feats = self._teacher_feats(x)
        z = self.tokenizer_encoder(feats)
        if self.use_quantizer:
            x_q, info = self.quantize(z)
            return {
                "encoded": x_q, "bottleneck_rep": info["indices"],
                "vfm_feats": feats, "loss_q": jnp.asarray(0.0),
            }
        return {"encoded": z, "vfm_feats": feats, "loss_q": jnp.asarray(0.0)}

    def _pixels(self, teacher_space):
        import einops

        h = self.dec_to_decimage(teacher_space.astype(self.dtype))
        h = self.pixel_decoder(h)
        h = self.final_layer(h)
        pt, p = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        hh = ww = self.vjepa2_img_size // p
        t = h.shape[1] // (hh * ww)
        return einops.rearrange(
            h, "b (t h w) (pt p1 p2 c) -> b c (t pt) (h p1) (w p2)",
            t=t, h=hh, w=ww, pt=pt, p1=p, p2=p, c=3,
        )

    def decode(self, x_q):
        recon_feats = self.tokenizer_decoder(x_q)
        return self._pixels(recon_feats), recon_feats

    def decode_from_bottleneck(self, indices):
        assert self.use_quantizer
        codes = self.quantize.indices_to_codes(indices).astype(jnp.float32)
        return self.decode(codes)[0]

    decode_indices = decode_from_bottleneck

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred, recon_feats = self.decode(enc["encoded"])
        target = jax.lax.stop_gradient(enc["vfm_feats"].astype(jnp.float32))
        rf = recon_feats.reshape(-1, self.teacher_dim)
        tf = target.reshape(-1, self.teacher_dim)
        cos = jnp.sum(rf * tf, -1) / (
            jnp.linalg.norm(rf, axis=-1) * jnp.linalg.norm(tf, axis=-1) + 1e-8
        )
        align_loss = (1.0 - jnp.mean(cos)) + 0.1 * jnp.mean(
            (recon_feats - target) ** 2
        )
        return {
            "pred_frames": pred, "align_loss": align_loss,
            **{k: v for k, v in enc.items() if k != "vfm_feats"},
        }


def _vfm_auto_factory(fusion, use_quantizer=True):
    fields = set(TeacherSpaceAutoEncoder.__dataclass_fields__)

    def factory(**overrides):
        args = {k: v for k, v in overrides.items() if k in fields}
        args["fusion"] = fusion
        args["use_quantizer"] = use_quantizer
        return TeacherSpaceAutoEncoder(**args)

    return factory


models.update({
    "autoencoder_vfm": _vfm_auto_factory("gated"),
    "autoencoder_vfm1": _vfm_auto_factory("pyramid"),
    "autoencoder_vfm2": _vfm_auto_factory("last"),
    "autoencoder_vfm_fianllayer": _vfm_auto_factory("last"),
    "autoencoder_vfm_fianllayer_noquant": _vfm_auto_factory("last", use_quantizer=False),
})
