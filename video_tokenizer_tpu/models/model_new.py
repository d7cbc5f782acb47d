"""model_new family: conv-patchify RoPE transformer tokenizers with FSQ.

Re-expresses `/root/reference/models/model_new/` TPU-first:
  * transformer block (base/transformer.py:31-86): fused 4x-width qkv+gate
    projection, QK head-dim LayerNorm, M-RoPE on q/k, flash attention (Pallas
    kernel here instead of CUDA flash_attn_func), sigmoid attention-output
    gating ("gating from qwen3-next"), GEGLU FFN (2/3*4d rounded to 32), and
    LayerNorm-Scaling residual x 1/sqrt(layer+1) (arXiv 2502.05795).
  * 'simple' block style (base/simpletransformer.py): pre-LN standard
    attention + MLP with RoPE and a final LayerNorm.
  * Encoder (base/blocks.py:18-81): Conv3d-patchify stem (fused matmul here,
    weight-equivalent), learned mask/latent tokens prepended, shared-rotary
    1D+THW M-RoPE, slice the first out_tokens, linear head to FSQ dims.
  * Decoder (base/blocks.py:84-150): latents + pixel mask tokens,
    ConvTranspose3d unpatchify (fused matmul transpose).
  * Decoder_unify (base/blocks.py:690-790): first-frame condition tokens
    prepended with multi-segment M-RoPE.
  * model size table (base/utils.py:6-37) incl. `_thin` halved-MLP variants.
  * registered AutoEncoders (autoencoder.py): convpatchify / greatfsq /
    mask2 / mask3 / mask2_greatfsq / simplytransformer / large /
    first_token_f256t{1024a,768,512}. Mask-token shape per variant:
    scalar (1,1,1), channel (1,1,D), or token (1,N,D).
  * Encoder111/Decoder111 (base/blocks.py:1110-1177): the 'mrope' train_type
    components of larp_tokenizer (query/mask tokens supplied by the caller).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from ..ops.rope import apply_rotary, mrope_cos_sin, mrope_cos_sin_multi
from ..registry import models
from .fsq import FSQ


def get_model_dims(model_size: str = "tiny", head_dim: int = 64, mlp_ratio: float = 4.0):
    if model_size.endswith("_thin"):
        model_size = model_size[:-5]
        layers = {"tiny": 2, "small": 5, "base": 7, "large": 8}[model_size]
        heads = {"tiny": 8, "small": 12, "base": 16, "large": 32}[model_size]
        mlp_ratio = mlp_ratio / 2
    else:
        layers = {"tiny": 4, "small": 8, "base": 12, "large": 24}[model_size]
        heads = {"tiny": 4, "small": 8, "base": 12, "large": 16}[model_size]
    return int(head_dim * heads), layers, heads, mlp_ratio


_trunc02 = nn.initializers.truncated_normal(0.02 / 0.87962566)  # torch trunc_normal std=.02


class GatedRoPEAttention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cos, sin):
        B, L, C = x.shape
        hd = self.dim // self.heads
        qkvg = nn.Dense(
            self.dim * 4, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="to_qkv",
        )(x)
        q, k, v, gate = jnp.split(qkvg, 4, axis=-1)
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, L, self.heads, hd)
        v = v.reshape(B, L, self.heads, hd)
        q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
        k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        out = attention(q, k, v, use_pallas=self.use_pallas).reshape(B, L, C)
        out = out * jax.nn.sigmoid(gate)
        return nn.Dense(
            self.dim, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="out_proj",
        )(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: float = 4.0
    mult_of: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.mult * (2 / 3) * self.dim)
        inner = self.mult_of * ((inner + self.mult_of - 1) // self.mult_of)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        h = nn.Dense(
            inner * 2, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="proj_in",
        )(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * a
        return nn.Dense(
            self.dim, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="proj_out",
        )(h)


class RoPEBlockStack(nn.Module):
    """Gated blocks with LayerNorm-Scaling, or 'simple' pre-LN blocks."""

    dim: int
    depth: int
    heads: int
    mlp_ratio: float = 4.0
    style: str = "gated"  # 'gated' | 'simple'
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cos, sin):
        if self.style == "gated":
            for i in range(self.depth):
                x = x + GatedRoPEAttention(
                    self.dim, self.heads, dtype=self.dtype,
                    use_pallas=self.use_pallas, name=f"attn_{i}",
                )(x, cos, sin)
                x = x + GEGLUFeedForward(
                    self.dim, self.mlp_ratio, dtype=self.dtype, name=f"ffd_{i}"
                )(x)
                x = x * (1.0 / math.sqrt(i + 1))  # LNS residual scaling
            return x
        # 'simple' style: pre-LN, standard attention+MLP, final norm
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            B, L, C = h.shape
            hd = self.dim // self.heads
            qkv = nn.Dense(
                3 * self.dim, use_bias=False, kernel_init=_trunc02,
                dtype=self.dtype, name=f"qkv_{i}",
            )(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = apply_rotary(q.reshape(B, L, self.heads, hd), cos, sin)
            k = apply_rotary(k.reshape(B, L, self.heads, hd), cos, sin)
            v = v.reshape(B, L, self.heads, hd)
            a = attention(q, k, v, use_pallas=self.use_pallas).reshape(B, L, C)
            x = x + nn.Dense(
                self.dim, kernel_init=_trunc02, dtype=self.dtype, name=f"proj_{i}"
            )(a)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            h = nn.Dense(
                int(self.dim * self.mlp_ratio), kernel_init=_trunc02,
                dtype=self.dtype, name=f"fc1_{i}",
            )(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(
                self.dim, kernel_init=_trunc02, dtype=self.dtype, name=f"fc2_{i}"
            )(h)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)


def _mask_shape(mode: str, n_tokens: int, width: int) -> Tuple[int, int, int]:
    return {
        "scalar": (1, 1, 1),
        "channel": (1, 1, width),
        "token": (1, n_tokens, width),
    }[mode]


class RoPEEncoder(nn.Module):
    model_size: str = "small"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 3
    out_channels: int = 6
    in_grid: Sequence[int] = (16, 128, 128)
    out_tokens: int = 1024
    mask_mode: str = "scalar"
    style: str = "gated"
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        grid = [g // p for g, p in zip(self.in_grid, self.patch_size)]
        pt, ph, pw = self.patch_size
        B = x.shape[0]
        # Conv3d(k=s=patch) == matmul over flattened tubelets (MXU-friendly)
        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
            pt=pt, p1=ph, p2=pw,
        ).astype(self.dtype)
        tokens = nn.Dense(
            width, use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="proj_in",
        )(tokens)

        scale = width**-0.5
        mask = self.param(
            "mask_token",
            lambda k, s: scale * jax.random.normal(k, s),
            _mask_shape(self.mask_mode, self.out_tokens, width),
        )
        mask_tokens = jnp.broadcast_to(
            mask.astype(tokens.dtype), (B, self.out_tokens, width)
        )
        h = jnp.concatenate([mask_tokens, tokens], axis=1)

        cos, sin = mrope_cos_sin(self.out_tokens, list(grid), width // heads)
        h = RoPEBlockStack(
            width, depth, heads, mlp_ratio, style=self.style,
            dtype=self.dtype, use_pallas=self.use_pallas, name="blocks",
        )(h, jnp.asarray(cos), jnp.asarray(sin))
        h = h[:, : self.out_tokens]
        return nn.Dense(
            self.out_channels, use_bias=True, kernel_init=_trunc02,
            name="proj_out",
        )(h.astype(jnp.float32))


class RoPEDecoder(nn.Module):
    model_size: str = "small"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 6  # token size
    out_channels: int = 3
    in_tokens: int = 1024
    cond_tokens: int = 0  # >0: first-frame conditioned (Decoder_unify)
    cond_grid: Sequence[int] = (1, 128, 128)
    out_grid: Sequence[int] = (16, 128, 128)
    mask_mode: str = "scalar"
    style: str = "gated"
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cond=None):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        grid = [g // p for g, p in zip(self.out_grid, self.patch_size)]
        grid_size = int(np.prod(grid))
        pt, ph, pw = self.patch_size
        B = x.shape[0]

        h = nn.Dense(
            width, use_bias=True, kernel_init=_trunc02, dtype=self.dtype,
            name="proj_in",
        )(x.astype(self.dtype))
        parts = []
        if self.cond_tokens > 0 and cond is not None:
            c = nn.Dense(
                width, use_bias=True, kernel_init=_trunc02, dtype=self.dtype,
                name="proj_cond",
            )(cond.astype(self.dtype))
            parts.append(c)
        parts.append(h)
        scale = width**-0.5
        mask = self.param(
            "mask_token",
            lambda k, s: scale * jax.random.normal(k, s),
            _mask_shape(self.mask_mode, grid_size, width),
        )
        parts.append(
            jnp.broadcast_to(mask.astype(h.dtype), (B, grid_size, width))
        )
        h = jnp.concatenate(parts, axis=1)

        if self.cond_tokens > 0:
            cond_patch_grid = [
                g // p for g, p in zip(self.cond_grid, (1, ph, pw))
            ]
            cos, sin = mrope_cos_sin_multi(
                [
                    (self.cond_tokens, cond_patch_grid),
                    (self.in_tokens, list(grid)),
                ],
                width // heads,
            )
            # each multi segment emits [toks 1D rows ‖ grid rows], but the
            # decoder sequence is [cond latents ‖ latents ‖ pixel queries]
            # — the conditioning frame's PIXEL grid is never decoded, so
            # its grid rows must be cut out, not left to shift every later
            # row (the torch reference crashes on this path with a
            # broadcast error, so these semantics are defined here)
            skip = int(np.prod(cond_patch_grid))
            cos = np.concatenate(
                [cos[: self.cond_tokens], cos[self.cond_tokens + skip:]], 0
            )
            sin = np.concatenate(
                [sin[: self.cond_tokens], sin[self.cond_tokens + skip:]], 0
            )
            if cond is None:
                cos = cos[self.cond_tokens:]
                sin = sin[self.cond_tokens:]
        else:
            cos, sin = mrope_cos_sin(self.in_tokens, list(grid), width // heads)
        # table now matches the sequence row-for-row: [cond ‖ latents ‖ pixels]
        cos = jnp.asarray(cos[: h.shape[1]])
        sin = jnp.asarray(sin[: h.shape[1]])

        h = RoPEBlockStack(
            width, depth, heads, mlp_ratio, style=self.style,
            dtype=self.dtype, use_pallas=self.use_pallas, name="blocks",
        )(h, cos, sin)
        h = h[:, -grid_size:]
        # ConvTranspose3d(k=s=patch) == matmul to tubelet pixels + reshape
        out = nn.Dense(
            self.out_channels * pt * ph * pw, use_bias=True,
            kernel_init=nn.initializers.xavier_uniform(), name="proj_out",
        )(h.astype(jnp.float32))
        return einops.rearrange(
            out, "b (t h w) (c pt p1 p2) -> b c (t pt) (h p1) (w p2)",
            t=grid[0], h=grid[1], w=grid[2], c=self.out_channels,
            pt=pt, p1=ph, p2=pw,
        )


class RoPEAutoEncoder(nn.Module):
    """Configurable model_new autoencoder; see registered factories below."""

    model_size: str = "small"
    decoder_model_size: Optional[str] = None
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    num_latent_tokens: int = 1024
    input_size: int = 128
    frame_num: int = 16
    patch_size: tuple = (4, 8, 8)
    in_channels: int = 3
    mask_mode: str = "scalar"
    style: str = "gated"
    first_token: bool = False
    first_frame_tokens: int = 256
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    # registry-arg compat (ignored, matching reference **kwargs)
    bottleneck: Any = None
    prior_model: Any = None

    @property
    def bottleneck_token_num(self) -> int:
        # the AR-facing token budget: ONLY the latent tokens that
        # `bottleneck_rep` actually returns. The first-frame tokens are
        # conditioning the prior never models — counting them here sized
        # AR priors for a sequence they never see (decode of a sampled
        # sequence still needs first-frame indices, so AR training on
        # first_token variants requires a frame-conditioned prior).
        return self.num_latent_tokens

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.fsq_levels))

    def setup(self):
        in_grid = (self.frame_num, self.input_size, self.input_size)
        token_size = len(self.fsq_levels)
        self.encoder = RoPEEncoder(
            model_size=self.model_size,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            out_channels=token_size,
            in_grid=in_grid,
            out_tokens=self.num_latent_tokens,
            mask_mode=self.mask_mode,
            style=self.style,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="encoder",
        )
        self.quantize = FSQ(self.fsq_levels)
        dec_size = self.decoder_model_size or self.model_size
        if self.first_token:
            self.encoder1 = RoPEEncoder(
                model_size=self.model_size,
                patch_size=(1, self.patch_size[1], self.patch_size[2]),
                in_channels=self.in_channels,
                out_channels=token_size,
                in_grid=(1, self.input_size, self.input_size),
                out_tokens=self.first_frame_tokens,
                mask_mode=self.mask_mode,
                style=self.style,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name="encoder1",
            )
            self.decoder = RoPEDecoder(
                model_size=dec_size,
                patch_size=self.patch_size,
                in_channels=token_size,
                out_channels=self.in_channels,
                in_tokens=self.num_latent_tokens,
                cond_tokens=self.first_frame_tokens,
                cond_grid=(1, self.input_size, self.input_size),
                out_grid=in_grid,
                mask_mode=self.mask_mode,
                style=self.style,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name="decoder",
            )
        else:
            self.decoder = RoPEDecoder(
                model_size=dec_size,
                patch_size=self.patch_size,
                in_channels=token_size,
                out_channels=self.in_channels,
                in_tokens=self.num_latent_tokens,
                out_grid=in_grid,
                mask_mode=self.mask_mode,
                style=self.style,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name="decoder",
            )

    def encode(self, data, train: bool = False) -> Dict[str, Any]:
        z = self.encoder(data)
        x_q, info = self.quantize(z)
        out = {"encoded": x_q, "bottleneck_rep": info["indices"],
               "loss_q": jnp.asarray(0.0)}
        if self.first_token:
            z1 = self.encoder1(data[:, :, 0:1])
            first_q, first_info = self.quantize(z1)
            out["first_encoded"] = first_q
            out["first_rep"] = first_info["indices"]
        return out

    def decode(self, x_q, first_q=None):
        if self.first_token:
            return self.decoder(x_q, first_q)
        return self.decoder(x_q)

    def decode_from_bottleneck(self, indices, first_indices=None):
        x_q = self.quantize.indices_to_codes(indices).astype(jnp.float32)
        if self.first_token:
            assert first_indices is not None
            f_q = self.quantize.indices_to_codes(first_indices).astype(jnp.float32)
            return self.decoder(x_q, f_q)
        return self.decoder(x_q)

    # reference API name (autoencoder.py:73)
    decode_indices = decode_from_bottleneck

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred = self.decode(enc["encoded"], enc.get("first_encoded"))
        return {"pred_frames": pred, **enc}


def _register_variant(name: str, **kw):
    fields = set(RoPEAutoEncoder.__dataclass_fields__)

    def factory(**overrides):
        args = dict(kw)
        args.update({k: v for k, v in overrides.items() if k in fields})
        return RoPEAutoEncoder(**args)

    factory.__name__ = f"make_{name}"
    models.update({name: factory})
    return factory


GREAT_FSQ = (8, 8, 8, 8, 5, 5, 5, 5)

_register_variant("autoencoder_convpatchify", model_size="small")
_register_variant(
    "autoencoder_convpatchify_greatfsq", model_size="base", fsq_levels=GREAT_FSQ
)
_register_variant("autoencoder_mask3", model_size="base", mask_mode="channel")
_register_variant(
    "autoencoder_convpatchify_mask2", model_size="base", mask_mode="token"
)
_register_variant(
    "autoencoder_convpatchify_mask2_greatfsq",
    model_size="base", mask_mode="token", fsq_levels=GREAT_FSQ,
)
_register_variant(
    "autoencoder_convpatchify_simplytransformer", model_size="base", style="simple"
)
_register_variant("autoencoder_large", model_size="large")
_register_variant(
    "autoencoder_first_token_f256t1024a",
    model_size="small_thin", decoder_model_size="small",
    first_token=True, num_latent_tokens=1024,
)
_register_variant(
    "autoencoder_first_token_f256t768",
    model_size="base", first_token=True, num_latent_tokens=768,
)
_register_variant(
    "autoencoder_first_token_f256t512",
    model_size="base", first_token=True, num_latent_tokens=512,
)
