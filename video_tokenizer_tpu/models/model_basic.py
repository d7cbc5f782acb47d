"""Basic + dualpatch families: learned-abs-PE FSQ autoencoders (no RoPE).

Re-expresses `/root/reference/models/model/` and `models/model_dualpatch/`:
  * same gated transformer block as model_new (fused qkv+gate, QK-norm,
    sigmoid output gating, GEGLU, LNS residual scaling) but WITHOUT rotary —
    positions come from learned absolute PEs and learned query/mask tokens
    (model/base/blocks.py:12-117). We reuse `RoPEBlockStack` with an identity
    rotation table (cos=1, sin=0), which XLA folds away.
  * `autoencoder` (model/autoencoder.py:8-87): linear patchify + abs PE +
    learned latent queries -> FSQ[8,8,5,5,5] (token dim 5), small_thin.
  * `autoencoder_dualpatch` (model_dualpatch/autoencoder.py:8-87): dual
    patchify — first frame (1,p,p) + rest frames (3,p,p) with separate PEs
    and dual unpatchify heads (model_dualpatch/base/blocks.py).
  * `autoencoder_first_token` / `_res` (model_dualpatch/autoencoder.py:178-348):
    dedicated first-frame encoder (256 tokens) + `Decoder_unify` whose prefix
    is [cond ‖ latents ‖ pixel queries]; FSQ[8,8,5,5,5]. The `_res` variant's
    residual input path is commented out in the reference — both share the
    architecture.
  * `autoencoder_design` (model_design/autoencoder.py:8-80): 2D first-frame
    encoder + unified decoder conditioned on its tokens.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import models
from .fsq import FSQ
from .model_new import RoPEBlockStack, get_model_dims, _trunc02


def _scaled_normal(scale):
    return lambda key, shape: scale * jax.random.normal(key, shape)


class NoRoPEStack(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        hd = self.dim // self.heads
        cos = jnp.ones((x.shape[1], hd // 2), jnp.float32)
        sin = jnp.zeros((x.shape[1], hd // 2), jnp.float32)
        return RoPEBlockStack(
            self.dim, self.depth, self.heads, self.mlp_ratio, style="gated",
            dtype=self.dtype, use_pallas=self.use_pallas, name="blocks",
        )(x, cos, sin)


class AbsPEEncoder(nn.Module):
    """Uniform-patch encoder with learned abs PE + latent queries."""

    model_size: str = "small_thin"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 3
    out_channels: int = 5
    in_grid: Sequence[int] = (16, 128, 128)
    out_tokens: int = 1024
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        grid = [g // p for g, p in zip(self.in_grid, self.patch_size)]
        pt, ph, pw = self.patch_size
        B = x.shape[0]
        scale = width**-0.5
        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
            pt=pt, p1=ph, p2=pw,
        ).astype(self.dtype)
        tokens = nn.Dense(width, kernel_init=_trunc02, name="proj_in")(tokens)
        pe = self.param(
            "positional_embedding", _scaled_normal(scale),
            (1, int(np.prod(grid)), width),
        )
        tokens = tokens + pe.astype(tokens.dtype)
        queries = self.param(
            "latent_token_mask", _scaled_normal(scale),
            (1, self.out_tokens, width),
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(queries.astype(tokens.dtype), (B, self.out_tokens, width)), tokens],
            axis=1,
        )
        h = NoRoPEStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="stack",
        )(h)
        return nn.Dense(
            self.out_channels, kernel_init=_trunc02, name="proj_out"
        )(h[:, : self.out_tokens].astype(jnp.float32))


class AbsPEDecoder(nn.Module):
    model_size: str = "small_thin"
    patch_size: Sequence[int] = (4, 8, 8)
    in_channels: int = 5
    out_channels: int = 3
    in_tokens: int = 1024
    cond_tokens: int = 0
    out_grid: Sequence[int] = (16, 128, 128)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cond=None):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        grid = [g // p for g, p in zip(self.out_grid, self.patch_size)]
        grid_size = int(np.prod(grid))
        pt, ph, pw = self.patch_size
        B = x.shape[0]
        scale = width**-0.5

        h = nn.Dense(width, kernel_init=_trunc02, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        pe = self.param(
            "positional_embedding", _scaled_normal(scale), (1, self.in_tokens, width)
        )
        h = h + pe.astype(h.dtype)
        parts = []
        if self.cond_tokens > 0 and cond is not None:
            c = nn.Dense(
                width, kernel_init=_trunc02, dtype=self.dtype, name="proj_cond"
            )(cond.astype(self.dtype))
            cpe = self.param(
                "cond_positional_embedding", _scaled_normal(scale),
                (1, self.cond_tokens, width),
            )
            parts.append(c + cpe.astype(c.dtype))
        parts.append(h)
        mask = self.param(
            "patch_token_mask", _scaled_normal(scale), (1, grid_size, width)
        )
        parts.append(jnp.broadcast_to(mask.astype(h.dtype), (B, grid_size, width)))
        h = jnp.concatenate(parts, axis=1)
        h = NoRoPEStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="stack",
        )(h)
        h = h[:, -grid_size:]
        out = nn.Dense(
            self.out_channels * pt * ph * pw, kernel_init=_trunc02, name="proj_out"
        )(h.astype(jnp.float32))
        return einops.rearrange(
            out, "b (t h w) (c pt p1 p2) -> b c (t pt) (h p1) (w p2)",
            t=grid[0], h=grid[1], w=grid[2], c=self.out_channels,
            pt=pt, p1=ph, p2=pw,
        )


class DualPatchEncoder(nn.Module):
    """First frame (1,p,p) + rest frames (pt_rest,p,p) patchified separately."""

    model_size: str = "small_thin"
    spatial_patch_size: Sequence[int] = (8, 8)
    rest_temporal_patch: int = 3
    in_channels: int = 3
    out_channels: int = 6
    num_frames: int = 16
    spatial_size: Sequence[int] = (128, 128)
    out_tokens: int = 1024
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        ph, pw = self.spatial_patch_size
        nh, nw = self.spatial_size[0] // ph, self.spatial_size[1] // pw
        first_n = nh * nw
        rest_frames = self.num_frames - 1
        rest_t = rest_frames // self.rest_temporal_patch
        rest_n = rest_t * nh * nw
        B = x.shape[0]
        scale = width**-0.5

        x_first = x[:, :, :1]
        x_rest = x[:, :, 1 : 1 + rest_t * self.rest_temporal_patch]
        f_first = einops.rearrange(
            x_first, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
            pt=1, p1=ph, p2=pw,
        )
        f_rest = einops.rearrange(
            x_rest, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
            pt=self.rest_temporal_patch, p1=ph, p2=pw,
        )
        f_first = nn.Dense(
            width, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="first_patch_embed",
        )(f_first.astype(self.dtype))
        f_rest = nn.Dense(
            width, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="rest_patch_embed",
        )(f_rest.astype(self.dtype))
        first_pe = self.param(
            "first_pos_embed", _scaled_normal(scale), (1, first_n, width)
        )
        rest_pe = self.param(
            "rest_pos_embed", _scaled_normal(scale), (1, rest_n, width)
        )
        patch_tokens = jnp.concatenate(
            [f_first + first_pe.astype(f_first.dtype),
             f_rest + rest_pe.astype(f_rest.dtype)], axis=1
        )
        queries = self.param(
            "latent_queries", _scaled_normal(scale), (1, self.out_tokens, width)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(queries.astype(patch_tokens.dtype), (B, self.out_tokens, width)),
             patch_tokens], axis=1,
        )
        h = NoRoPEStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="stack",
        )(h)
        return nn.Dense(
            self.out_channels, kernel_init=_trunc02, name="proj_out"
        )(h[:, : self.out_tokens].astype(jnp.float32))


class DualPatchDecoder(nn.Module):
    model_size: str = "small_thin"
    spatial_patch_size: Sequence[int] = (8, 8)
    rest_temporal_patch: int = 3
    in_channels: int = 6
    out_channels: int = 3
    in_tokens: int = 1024
    num_frames: int = 16
    spatial_size: Sequence[int] = (128, 128)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        width, depth, heads, mlp_ratio = get_model_dims(self.model_size)
        ph, pw = self.spatial_patch_size
        nh, nw = self.spatial_size[0] // ph, self.spatial_size[1] // pw
        first_n = nh * nw
        rest_frames = self.num_frames - 1
        rest_t = rest_frames // self.rest_temporal_patch
        rest_n = rest_t * nh * nw
        B = x.shape[0]
        scale = width**-0.5

        h = nn.Dense(width, kernel_init=_trunc02, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        pe = self.param(
            "latent_pos_embed", _scaled_normal(scale), (1, self.in_tokens, width)
        )
        h = h + pe.astype(h.dtype)
        fq = self.param(
            "first_patch_queries", _scaled_normal(scale), (1, first_n, width)
        )
        rq = self.param(
            "rest_patch_queries", _scaled_normal(scale), (1, rest_n, width)
        )
        h = jnp.concatenate(
            [h,
             jnp.broadcast_to(fq.astype(h.dtype), (B, first_n, width)),
             jnp.broadcast_to(rq.astype(h.dtype), (B, rest_n, width))], axis=1,
        )
        h = NoRoPEStack(
            width, depth, heads, mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="stack",
        )(h)
        h_first = h[:, self.in_tokens : self.in_tokens + first_n]
        h_rest = h[:, self.in_tokens + first_n :]
        out_first = nn.Dense(
            self.out_channels * ph * pw, kernel_init=_trunc02, name="first_unpatch"
        )(h_first.astype(jnp.float32))
        out_first = einops.rearrange(
            out_first, "b (t h w) (c pt p1 p2) -> b c (t pt) (h p1) (w p2)",
            t=1, h=nh, w=nw, c=self.out_channels, pt=1, p1=ph, p2=pw,
        )
        out_rest = nn.Dense(
            self.out_channels * self.rest_temporal_patch * ph * pw,
            kernel_init=_trunc02, name="rest_unpatch",
        )(h_rest.astype(jnp.float32))
        out_rest = einops.rearrange(
            out_rest, "b (t h w) (c pt p1 p2) -> b c (t pt) (h p1) (w p2)",
            t=rest_t, h=nh, w=nw, c=self.out_channels,
            pt=self.rest_temporal_patch, p1=ph, p2=pw,
        )
        return jnp.concatenate([out_first, out_rest], axis=2)


class BasicAutoEncoder(nn.Module):
    """Configurable basic/dualpatch FSQ autoencoder."""

    arch: str = "uniform"  # 'uniform' | 'dualpatch' | 'first_token'
    model_size: str = "small_thin"
    decoder_model_size: Optional[str] = None
    fsq_levels: tuple = (8, 8, 5, 5, 5)
    num_latent_tokens: int = 1024
    input_size: int = 128
    frame_num: int = 16
    patch_size: tuple = (4, 8, 8)
    in_channels: int = 3
    first_frame_tokens: int = 256
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    bottleneck: Any = None
    prior_model: Any = None

    @property
    def bottleneck_token_num(self) -> int:
        # AR-facing token budget: only what encode()'s bottleneck_rep
        # returns. Counting the first-frame conditioning tokens sized AR
        # priors for a sequence they never see and broke sampling (the
        # decoder still needs first_indices — see decode_from_bottleneck).
        return self.num_latent_tokens

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.fsq_levels))

    def setup(self):
        token_size = len(self.fsq_levels)
        in_grid = (self.frame_num, self.input_size, self.input_size)
        dec_size = self.decoder_model_size or self.model_size
        common = dict(dtype=self.dtype, use_pallas=self.use_pallas)
        self.quantize = FSQ(self.fsq_levels)
        if self.arch == "uniform":
            self.encoder = AbsPEEncoder(
                model_size=self.model_size, patch_size=self.patch_size,
                out_channels=token_size, in_grid=in_grid,
                out_tokens=self.num_latent_tokens, name="encoder", **common,
            )
            self.decoder = AbsPEDecoder(
                model_size=dec_size, patch_size=self.patch_size,
                in_channels=token_size, in_tokens=self.num_latent_tokens,
                out_grid=in_grid, name="decoder", **common,
            )
        elif self.arch == "dualpatch":
            self.encoder = DualPatchEncoder(
                model_size=self.model_size, out_channels=token_size,
                num_frames=self.frame_num,
                spatial_size=(self.input_size, self.input_size),
                out_tokens=self.num_latent_tokens, name="encoder", **common,
            )
            self.decoder = DualPatchDecoder(
                model_size=dec_size, in_channels=token_size,
                in_tokens=self.num_latent_tokens, num_frames=self.frame_num,
                spatial_size=(self.input_size, self.input_size),
                name="decoder", **common,
            )
        elif self.arch == "first_token":
            self.encoder = AbsPEEncoder(
                model_size=self.model_size, patch_size=self.patch_size,
                out_channels=token_size, in_grid=in_grid,
                out_tokens=self.num_latent_tokens, name="encoder", **common,
            )
            self.encoder1 = AbsPEEncoder(
                model_size=self.model_size,
                patch_size=(1, self.patch_size[1], self.patch_size[2]),
                out_channels=token_size,
                in_grid=(1, self.input_size, self.input_size),
                out_tokens=self.first_frame_tokens, name="encoder1", **common,
            )
            self.decoder = AbsPEDecoder(
                model_size=dec_size, patch_size=self.patch_size,
                in_channels=token_size, in_tokens=self.num_latent_tokens,
                cond_tokens=self.first_frame_tokens, out_grid=in_grid,
                name="decoder", **common,
            )
        else:
            raise ValueError(self.arch)

    def encode(self, data, train: bool = False) -> Dict[str, Any]:
        z = self.encoder(data)
        x_q, info = self.quantize(z)
        out = {"encoded": x_q, "bottleneck_rep": info["indices"],
               "loss_q": jnp.asarray(0.0)}
        if self.arch == "first_token":
            z1 = self.encoder1(data[:, :, :1])
            f_q, f_info = self.quantize(z1)
            out["first_encoded"] = f_q
            out["first_rep"] = f_info["indices"]
        return out

    def decode(self, x_q, first_q=None):
        if self.arch == "first_token":
            return self.decoder(x_q, first_q)
        return self.decoder(x_q)

    def decode_from_bottleneck(self, indices, first_indices=None):
        x_q = self.quantize.indices_to_codes(indices).astype(jnp.float32)
        if self.arch == "first_token":
            if first_indices is None:
                raise ValueError(
                    "first_token decode needs first-frame indices: a plain "
                    "class-conditional AR prior cannot drive this family — "
                    "use frame-prediction sampling (which encodes the "
                    "conditioning frame) or a non-first_token arch"
                )
            f_q = self.quantize.indices_to_codes(first_indices).astype(jnp.float32)
            return self.decoder(x_q, f_q)
        return self.decoder(x_q)

    decode_indices = decode_from_bottleneck

    def __call__(self, data, train: bool = False) -> Dict[str, Any]:
        enc = self.encode(data, train=train)
        pred = self.decode(enc["encoded"], enc.get("first_encoded"))
        return {"pred_frames": pred, **enc}


def _register_basic(name: str, **kw):
    fields = set(BasicAutoEncoder.__dataclass_fields__)

    def factory(**overrides):
        args = dict(kw)
        args.update({k: v for k, v in overrides.items() if k in fields})
        return BasicAutoEncoder(**args)

    factory.__name__ = f"make_{name}"
    models.update({name: factory})


_register_basic("autoencoder", arch="uniform", model_size="small_thin",
                fsq_levels=(8, 8, 5, 5, 5))
_register_basic("autoencoder_dualpatch", arch="dualpatch",
                model_size="small_thin", fsq_levels=(8, 8, 8, 5, 5, 5))
_register_basic("autoencoder_first_token", arch="first_token",
                model_size="small_thin", fsq_levels=(8, 8, 5, 5, 5))
_register_basic("autoencoder_first_token_res", arch="first_token",
                model_size="small_thin", fsq_levels=(8, 8, 5, 5, 5))
_register_basic("autoencoder_design", arch="first_token",
                model_size="small_thin", fsq_levels=(8, 8, 8, 5, 5, 5))
