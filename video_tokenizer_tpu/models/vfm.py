"""VJEPA2-teacher (video-foundation-model) tokenizers.

Re-expresses `/root/reference/models/larp_tokenizer_vfm.py`:
  * frozen VJEPA2 ViT teacher (`vit_huge_rope`, out_layers [8,16,24,31],
    vfm.py:549-566). The reference imports the external `vjepa2` package and
    its checkpoint from disk, degrading when absent (:540-546). Here the
    teacher is a Flax ViT with 3-axis RoPE whose weights load from a
    converted .npz (tools/convert_vjepa2.py); without weights it initializes
    randomly and `teacher_pretrained=False` is surfaced, mirroring the
    reference's graceful degradation.
  * multi-layer feature fusion: per-layer LN + gated linear fusion
    (GatedLinearLayerFusion, :145-216) or semantic-pyramid injectors
    (:43-143).
  * `larp_tokenizer_vfm` (:287-875): teacher tokens -> jepa_to_encoder
    Linear -> query-token ViT encoder -> vq/sq bottleneck -> latent decoder
    -> dec_to_decimage -> DEC pixel transformer -> OutputLayer -> unpatchify
    (pt=2, p=16); alignment loss = cosine + 0.1*MSE between aligned decoder
    features and the (detached) teacher features (:849-874).
  * `larp_tokenizer_vfm_noquant` (:877-1386): teacher features -> pixels
    only (no bottleneck) — the default model of the committed reference cfg
    (cfgs/larp_tokenizer.yaml:37).

Teacher preprocessing: resize to the teacher's img size + ImageNet
normalization (:566,1137), on device via jax.image.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sincos
from ..ops.attention import attention
from ..ops.rope import apply_rotary, mrope_cos_sin
from ..registry import models
from .bottleneck import Bottleneck
from .fsq import LatticeVectorQuantizer
from .larp_tokenizer import OutputLayer
from .transformer import ViTStack

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VJEPA2TeacherViT(nn.Module):
    """3D-RoPE ViT feature extractor with multi-layer taps (teacher)."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    img_size: int = 256
    num_frames: int = 16
    patch_size: int = 16
    tubelet_size: int = 2
    out_layers: Sequence[int] = (8, 16, 24, 31)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        """x: [B, C, T, H, W] normalized. Returns list of [B, N, D] taps."""
        pt, p = self.tubelet_size, self.patch_size
        grid = (
            self.num_frames // pt, self.img_size // p, self.img_size // p
        )
        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
            pt=pt, p1=p, p2=p,
        ).astype(self.dtype)
        h = nn.Dense(self.embed_dim, name="patch_embed")(tokens)
        hd = self.embed_dim // self.num_heads
        cos, sin = mrope_cos_sin(0, list(grid), hd, interleave=False)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)

        taps = []
        B, N, C = h.shape
        for i in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(h)
            qkv = nn.Dense(
                3 * self.embed_dim, dtype=self.dtype, name=f"qkv_{i}"
            )(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = apply_rotary(q.reshape(B, N, self.num_heads, hd), cos, sin)
            k = apply_rotary(k.reshape(B, N, self.num_heads, hd), cos, sin)
            v = v.reshape(B, N, self.num_heads, hd)
            a = attention(q, k, v, use_pallas=self.use_pallas).reshape(B, N, C)
            h = h + nn.Dense(self.embed_dim, dtype=self.dtype, name=f"proj_{i}")(a)
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(h)
            y = nn.Dense(4 * self.embed_dim, dtype=self.dtype, name=f"fc1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            h = h + nn.Dense(self.embed_dim, dtype=self.dtype, name=f"fc2_{i}")(y)
            if i in self.out_layers:
                taps.append(h.astype(jnp.float32))
        return taps


class GatedLinearLayerFusion(nn.Module):
    """sum_l sigmoid(MLP(LN(f_l))) * Linear(LN(f_l)), post-LN
    (larp_tokenizer_vfm.py:145-216; ONE pre_ln SHARED across layers,
    matching the reference's single self.pre_ln)."""

    dim: int
    num_layers: int
    gate_hidden_ratio: float = 0.25

    @nn.compact
    def __call__(self, feats_list: List[jax.Array]) -> jax.Array:
        assert len(feats_list) == self.num_layers
        hidden = max(1, int(self.dim * self.gate_hidden_ratio))
        pre_ln = nn.LayerNorm(name="pre_ln")
        fused = None
        for i, f in enumerate(feats_list):
            x = pre_ln(f)
            g = nn.Dense(hidden, name=f"gate_fc1_{i}")(x)
            g = nn.gelu(g, approximate=False)
            g = jax.nn.sigmoid(nn.Dense(1, name=f"gate_fc2_{i}")(g))
            proj = nn.Dense(self.dim, name=f"proj_{i}")(x)
            contrib = g * proj
            fused = contrib if fused is None else fused + contrib
        return nn.LayerNorm(name="post_ln")(fused)


class ConcatLayerFusion(nn.Module):
    """Per-layer LayerNorm -> concat -> Linear(L*D -> D) -> GELU — the
    reference noquant model's (only) fusion
    (larp_tokenizer_vfm.py:1100-1200)."""

    dim: int
    num_layers: int

    @nn.compact
    def __call__(self, feats_list: List[jax.Array]) -> jax.Array:
        assert len(feats_list) == self.num_layers
        normed = [
            nn.LayerNorm(name=f"ln_{i}")(f) for i, f in enumerate(feats_list)
        ]
        h = nn.Dense(self.dim, name="fusion_fc")(
            jnp.concatenate(normed, axis=-1)
        )
        return nn.gelu(h, approximate=False)


class LightweightSemanticInjector(nn.Module):
    """AdaIN-style injection (reference larp_tokenizer_vfm.py:43-114):
    deep -> proj_down+SiLU -> DEPTHWISE Conv3d spatial mix -> SiLU ->
    ZERO-INIT proj_up -> (scale, shift); GroupNorm(32)(shallow) modulated
    by (scale+1, shift) plus a residual — exactly identity at init."""

    dim: int
    grid: Tuple[int, int, int]
    reduction_ratio: int = 128
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x_shallow, x_deep):
        B, N, D = x_shallow.shape
        T, H, W = self.grid
        hidden = max(1, self.dim // self.reduction_ratio)
        h = nn.silu(nn.Dense(hidden, name="proj_down")(x_deep))
        h3 = h.reshape(B, T, H, W, hidden)
        h3 = nn.Conv(
            hidden, (self.kernel_size,) * 3, padding="SAME",
            feature_group_count=hidden, name="spatial_mix",
        )(h3)
        h = h3.reshape(B, N, hidden)
        style = nn.Dense(
            2 * D, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="proj_up",
        )(nn.silu(h))
        scale, shift = jnp.split(style, 2, axis=-1)
        shallow_norm = nn.GroupNorm(num_groups=32, name="norm_shallow")(
            x_shallow
        )
        return x_shallow + shallow_norm * (scale + 1.0) + shift


class SemanticPyramidFusion(nn.Module):
    """Cascade injectors l31->l24->l16->l8 (larp_tokenizer_vfm.py:116-143)."""

    dim: int
    grid: Tuple[int, int, int]

    @nn.compact
    def __call__(self, feats_list: List[jax.Array]) -> jax.Array:
        f8, f16, f24, f31 = feats_list
        h = LightweightSemanticInjector(
            self.dim, self.grid, name="injector_l24")(f24, f31)
        h = LightweightSemanticInjector(
            self.dim, self.grid, name="injector_l16")(f16, h)
        h = LightweightSemanticInjector(
            self.dim, self.grid, name="injector_l8")(f8, h)
        return nn.LayerNorm(name="out_ln")(h)


class _VFMBase(nn.Module):
    teacher_dim: int = 1280
    teacher_depth: int = 32
    teacher_heads: int = 16
    vjepa2_img_size: int = 256
    vjepa2_num_frames: int = 16
    vjepa2_patch_size: int = 16
    vjepa2_tubelet_size: int = 2
    out_layers: tuple = (8, 16, 24, 31)
    fusion: str = "gated"  # 'gated' | 'pyramid' | 'concat' | 'last'
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    def _make_teacher(self):
        return VJEPA2TeacherViT(
            embed_dim=self.teacher_dim,
            depth=self.teacher_depth,
            num_heads=self.teacher_heads,
            img_size=self.vjepa2_img_size,
            num_frames=self.vjepa2_num_frames,
            patch_size=self.vjepa2_patch_size,
            tubelet_size=self.vjepa2_tubelet_size,
            out_layers=self.out_layers,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="teacher_model",
        )

    def _preprocess_for_teacher(self, x):
        """[B,C,T,H,W] in [0,1] -> resized + imagenet-normalized."""
        B, C, T, H, W = x.shape
        s = self.vjepa2_img_size
        if (H, W) != (s, s):
            x = jax.image.resize(x, (B, C, T, s, s), method="bilinear")
        mean = IMAGENET_MEAN.reshape(1, 3, 1, 1, 1)
        std = IMAGENET_STD.reshape(1, 3, 1, 1, 1)
        return (x - mean) / std

    @property
    def frame_num(self) -> int:
        """Trainer-facing clip geometry (reference sets input_size/frame_num
        on the module, larp_tokenizer_vfm.py:347-348)."""
        return self.vjepa2_num_frames

    @property
    def input_size(self) -> int:
        return self.vjepa2_img_size

    @property
    def teacher_grid(self):
        return (
            self.vjepa2_num_frames // self.vjepa2_tubelet_size,
            self.vjepa2_img_size // self.vjepa2_patch_size,
            self.vjepa2_img_size // self.vjepa2_patch_size,
        )

    def _make_fusion(self):
        if self.fusion == "gated":
            return GatedLinearLayerFusion(
                self.teacher_dim, len(self.out_layers), name="fusion_proj"
            )
        if self.fusion == "pyramid":
            return SemanticPyramidFusion(
                self.teacher_dim, self.teacher_grid, name="fusion_proj"
            )
        if self.fusion == "concat":
            return ConcatLayerFusion(
                self.teacher_dim, len(self.out_layers), name="fusion_proj"
            )
        return None  # 'last'

    def _extract_vfm_features(self, x):
        xt = self._preprocess_for_teacher(x.astype(jnp.float32))
        # stop_gradient ON THE TAPS freezes the teacher: gradients from the
        # fusion/decoder losses must never update VJEPA2 weights (the
        # reference sets requires_grad=False); an input-side stop_gradient
        # alone does NOT cut the parameter gradients.
        taps = [
            jax.lax.stop_gradient(t)
            for t in self.teacher(jax.lax.stop_gradient(xt))
        ]
        if self.fusion in ("gated", "pyramid", "concat"):
            return self.fusion_proj(taps)
        return taps[-1]


@models.register("larp_tokenizer_vfm_noquant")
class LARPTokenizerVFMNoQuant(_VFMBase):
    """Teacher-features -> pixels decoder (no bottleneck). Default reference
    cfg model (cfgs/larp_tokenizer.yaml:37)."""

    decoder_hidden_size: int = 768
    dec_depth: int = 16
    dec_heads: int = 12
    # reference noquant always uses per-layer-LN + concat + Linear + GELU
    # fusion (larp_tokenizer_vfm.py:1100-1200) — make it the default here
    fusion: str = "concat"
    bottleneck: Any = None
    prior_model: Any = None

    def setup(self):
        self.teacher = self._make_teacher()
        fp = self._make_fusion()
        if fp is not None:
            self.fusion_proj = fp
        d = self.decoder_hidden_size
        self.dec_to_decimage = nn.Dense(d, name="dec_to_decimage")
        n_tokens = (
            (self.vjepa2_num_frames // self.vjepa2_tubelet_size)
            * (self.vjepa2_img_size // self.vjepa2_patch_size) ** 2
        )
        self.imagedec_latent_pe = jnp.asarray(
            sincos.sincos_1d(d, np.arange(n_tokens))
        ).reshape(1, n_tokens, d)
        self.pixel_decoder = ViTStack(
            d, self.dec_depth, self.dec_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, name="pixel_decoder",
        )
        # OutputLayer: teacher tubelet/patch-sized pixel tubelets
        # (reference hardcodes pt=2, p=16 for 256^2, vfm.py:1351-1357)
        pt, p = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        self.final_layer = OutputLayer(pt * p * p * 3, name="final_layer")

    def unpatchify(self, x):
        pt, p = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        h = w = self.vjepa2_img_size // p
        t = x.shape[1] // (h * w)
        return einops.rearrange(
            x, "b (t h w) (pt p1 p2 c) -> b c (t pt) (h p1) (w p2)",
            t=t, h=h, w=w, pt=pt, p1=p, p2=p, c=3,
        )

    def encode(self, x, train: bool = False) -> Dict[str, Any]:
        return {"encoded": self._extract_vfm_features(x)}

    def decode(self, z):
        x = self.dec_to_decimage(z)
        x = x + self.imagedec_latent_pe.astype(x.dtype)
        x = self.pixel_decoder(x)
        x = self.final_layer(x)
        return self.unpatchify(x)

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        return {"pred_frames": self.decode(enc["encoded"]), **enc}


@models.register("larp_tokenizer_vfm")
class LARPTokenizerVFM(_VFMBase):
    """Full VFM tokenizer: teacher feats -> student encoder -> bottleneck ->
    decoder, with teacher-alignment loss."""

    bottleneck: Optional[Dict[str, Any]] = None
    prior_model: Any = None
    bottleneck_type: str = "sq"
    bottleneck_token_num: int = 1024
    encoder_hidden_size: int = 768
    decoder_hidden_size: int = 768
    encoder_num_heads: int = 12
    decoder_num_heads: int = 12
    encoder_depth: int = 12
    decoder_depth: int = 12
    imagedec_hidden_size: int = 1024
    imagedec_depth: int = 24
    imagedec_heads: int = 16
    sq_n_embed: int = 196_560
    sq_embed_dim: int = 24

    @property
    def teacher_tokens(self) -> int:
        return (
            (self.vjepa2_num_frames // self.vjepa2_tubelet_size)
            * (self.vjepa2_img_size // self.vjepa2_patch_size) ** 2
        )

    @property
    def codebook_size(self) -> int:
        if self.bottleneck_type == "vq":
            return self.bottleneck["args"]["regularizer"]["args"]["codebook_size"]
        return self.sq_n_embed

    def setup(self):
        self.teacher = self._make_teacher()
        fp = self._make_fusion()
        if fp is not None:
            self.fusion_proj = fp
        enc_d, dec_d = self.encoder_hidden_size, self.decoder_hidden_size
        n = self.teacher_tokens
        self.jepa_to_encoder = nn.Dense(enc_d, name="jepa_to_encoder")
        self.encoder_patch_pe = jnp.asarray(
            sincos.sincos_1d(enc_d, np.arange(n))
        ).reshape(1, n, enc_d)
        self.encoder_latent_query_embed = self.param(
            "encoder_latent_query_embed", nn.initializers.normal(0.02),
            (self.bottleneck_token_num, enc_d),
        )
        self.encoder = ViTStack(
            enc_d, self.encoder_depth, self.encoder_num_heads,
            dtype=self.dtype, use_pallas=self.use_pallas, name="encoder",
        )
        if self.bottleneck_type == "vq":
            bn = dict(self.bottleneck)
            self.bottleneck_module = Bottleneck(
                bottleneck_dim=bn["args"]["bottleneck_dim"],
                input_dim=enc_d, output_dim=dec_d,
                token_nums=self.bottleneck_token_num,
                norm=bn["args"].get("norm"),
                regularizer=bn["args"]["regularizer"],
                name="bottleneck_module",
            )
        elif self.bottleneck_type == "sq":
            self.sq_in_linear = nn.Dense(self.sq_embed_dim, name="sq_in_linear")
            self.sq_out_linear = nn.Dense(dec_d, name="sq_out_linear")
            self.sq = LatticeVectorQuantizer(
                n_embed=self.sq_n_embed, embed_dim=self.sq_embed_dim,
                name="sq_quantizer",
            )
        else:
            raise ValueError(self.bottleneck_type)

        self.decoder_latent_pe = jnp.asarray(
            sincos.sincos_1d(dec_d, np.arange(self.bottleneck_token_num))
        ).reshape(1, self.bottleneck_token_num, dec_d)
        self.decoder_patch_query_embed = self.param(
            "decoder_patch_query_embed", nn.initializers.normal(0.02),
            (1, n, dec_d),
        )
        self.decoder = ViTStack(
            dec_d, self.decoder_depth, self.decoder_num_heads,
            dtype=self.dtype, use_pallas=self.use_pallas, name="decoder",
        )
        self.aligner = nn.Dense(self.teacher_dim, name="aligner")
        idd = self.imagedec_hidden_size
        self.dec_to_decimage = nn.Dense(idd, name="dec_to_decimage")
        self.imagedec_latent_pe = jnp.asarray(
            sincos.sincos_1d(idd, np.arange(n))
        ).reshape(1, n, idd)
        self.pixel_decoder = ViTStack(
            idd, self.imagedec_depth, self.imagedec_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, name="pixel_decoder",
        )
        pt2, p2_ = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        self.final_layer = OutputLayer(pt2 * p2_ * p2_ * 3, name="final_layer")

    def unpatchify(self, x):
        pt, p = self.vjepa2_tubelet_size, self.vjepa2_patch_size
        h = w = self.vjepa2_img_size // p
        t = x.shape[1] // (h * w)
        return einops.rearrange(
            x, "b (t h w) (pt p1 p2 c) -> b c (t pt) (h p1) (w p2)",
            t=t, h=h, w=w, pt=pt, p1=p, p2=p, c=3,
        )

    def encode(self, x, train: bool = False) -> Dict[str, Any]:
        vfm_feats = self._extract_vfm_features(x)
        h = self.jepa_to_encoder(vfm_feats)
        h = h + self.encoder_patch_pe.astype(h.dtype)
        b = h.shape[0]
        q = jnp.broadcast_to(
            self.encoder_latent_query_embed[None].astype(h.dtype),
            (b, self.bottleneck_token_num, h.shape[-1]),
        )
        z = self.encoder(jnp.concatenate([h, q], axis=1))
        z = z[:, -self.bottleneck_token_num :]
        if self.bottleneck_type == "vq":
            out = self.bottleneck_module(z.astype(jnp.float32), train=train)
            encoded = out.pop("output")
            return {"encoded": encoded, "vfm_feats": vfm_feats, **out}
        z = self.sq_in_linear(z)
        out = self.sq(z.astype(jnp.float32), train=train)
        encoded = self.sq_out_linear(out.pop("output"))
        return {
            "encoded": encoded, "vfm_feats": vfm_feats,
            "loss_q": out.pop("loss_codebook"), **out,
        }

    def decode(self, z):
        b = z.shape[0]
        z = z + self.decoder_latent_pe.astype(z.dtype)
        pq = jnp.broadcast_to(
            self.decoder_patch_query_embed.astype(z.dtype),
            (b, self.teacher_tokens, z.shape[-1]),
        )
        h = self.decoder(jnp.concatenate([z, pq], axis=1))
        h = h[:, -self.teacher_tokens :]
        dec_vfm = h
        x = self.dec_to_decimage(h)
        x = x + self.imagedec_latent_pe.astype(x.dtype)
        x = self.pixel_decoder(x)
        x = self.final_layer(x)
        return self.unpatchify(x), dec_vfm

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred, dec_vfm = self.decode(enc["encoded"])
        vfm_feats = jax.lax.stop_gradient(enc["vfm_feats"].astype(jnp.float32))
        align_student = self.aligner(dec_vfm.astype(jnp.float32))
        sf = align_student.reshape(-1, self.teacher_dim)
        tf = vfm_feats.reshape(-1, self.teacher_dim)
        cos = jnp.sum(sf * tf, -1) / (
            jnp.linalg.norm(sf, axis=-1) * jnp.linalg.norm(tf, axis=-1) + 1e-8
        )
        align_loss = (1.0 - jnp.mean(cos)) + 0.1 * jnp.mean((align_student - vfm_feats) ** 2)
        return {
            "pred_frames": pred, "align_loss": align_loss,
            **{k: v for k, v in enc.items() if k != "vfm_feats"},
        }


def load_teacher_weights(variables, npz_path: str):
    """Replace the 'teacher_model' subtree with converted VJEPA2 weights."""
    data = np.load(npz_path, allow_pickle=True)
    teacher = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
    params = dict(variables["params"])
    params["teacher_model"] = teacher
    return {**variables, "params": params}
