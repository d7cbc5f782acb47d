"""Cosmos-style causal 3D-CNN video tokenizers (dual ref/motion branch).

Re-expresses `/root/reference/models/cosmos.py` TPU-first:
  * `CausalConv3d` (cosmos.py:64-95): replicate-first-frame time padding
    (causal), constant spatial padding. Implemented channel-last (NDHWC) so
    XLA lowers convs straight onto the MXU; module boundaries stay BCTHW.
  * factorized causal resnet blocks ((1,3,3) then (3,1,1), cosmos.py:97-127),
    spatial + causal-temporal attention blocks (:129-178), hybrid
    down/upsampling (:180-281), and the decoder's spatial cross-attention
    injection of reference features at multiple scales (:286-311,454-490).
  * `CosmosDualSharedEncoder` (:317-385): ONE shared trunk applied to both
    the first frame (reference; spatial-only strides) and the motion frames
    (spatio-temporal strides), with separate ref/motion heads.
  * quantizers: `FSQuantizer` with in/out projections (:492-646, channel-
    first video layout) and `SimVQ` (:772-875) — frozen Gaussian codebook +
    learnable linear projection; the nearest-neighbor scan runs through the
    fused Pallas `vq_lookup` kernel.
  * registered models: 'cosmos' (SimVQ) and 'cosmos_fsq'
    (:650-764,878-975), both exposing encode_indices/decode_indices.

The reference's runtime `time_factor = 1 + (T>1)` branch (:267) is resolved
statically: shapes are compile-time constants under jit.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.vq import vq_lookup
from ..registry import models
from .fsq import FSQ


# internal layout: [B, T, H, W, C]


class CausalConv3d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: int = 1
    time_stride: int = 1
    padding: int = 0  # spatial constant padding
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        time_pad = max(0, (kt - 1) + (1 - self.time_stride))
        if time_pad > 0:
            first = jnp.repeat(x[:, :1], time_pad, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        p = self.padding
        if p > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        return nn.Conv(
            self.out_channels, (kt, kh, kw),
            strides=(self.time_stride, self.stride, self.stride),
            padding="VALID",
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="conv3d",
        )(x)


class CausalNormalize(nn.Module):
    num_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype,
            name="norm",
        )(x)


class CausalResnetBlockFactorized3d(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = CausalNormalize(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(out_ch, (1, 3, 3), padding=1, dtype=self.dtype, name="conv1_s")(h)
        h = CausalConv3d(out_ch, (3, 1, 1), dtype=self.dtype, name="conv1_t")(h)
        h = CausalNormalize(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = CausalConv3d(out_ch, (1, 3, 3), padding=1, dtype=self.dtype, name="conv2_s")(h)
        h = CausalConv3d(out_ch, (3, 1, 1), dtype=self.dtype, name="conv2_t")(h)
        if in_ch != out_ch:
            x = CausalConv3d(out_ch, (1, 1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class CausalAttnBlock(nn.Module):
    """Per-frame spatial self-attention (1x1x1 conv q/k/v)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = CausalNormalize(dtype=self.dtype, name="norm")(x)
        q = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="q")(h)
        k = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="k")(h)
        v = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="v")(h)
        B, T, H, W, _ = q.shape
        qf = q.reshape(B * T, H * W, C).astype(jnp.float32)
        kf = k.reshape(B * T, H * W, C).astype(jnp.float32)
        vf = v.reshape(B * T, H * W, C).astype(jnp.float32)
        w = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", qf, kf) * (C**-0.5), axis=-1
        )
        out = jnp.einsum("bqk,bkc->bqc", w, vf).reshape(B, T, H, W, C)
        out = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(
            out.astype(x.dtype)
        )
        return x + out


class CausalTemporalAttnBlock(nn.Module):
    """Per-position causal temporal self-attention."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if T <= 1:
            return x
        h = CausalNormalize(dtype=self.dtype, name="norm")(x)
        q = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="q")(h)
        k = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="k")(h)
        v = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="v")(h)
        qf = einops.rearrange(q, "b t h w c -> (b h w) t c").astype(jnp.float32)
        kf = einops.rearrange(k, "b t h w c -> (b h w) t c").astype(jnp.float32)
        vf = einops.rearrange(v, "b t h w c -> (b h w) t c").astype(jnp.float32)
        logits = jnp.einsum("bqc,bkc->bqk", qf, kf) * (C**-0.5)
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask[None], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", w, vf)
        out = einops.rearrange(out, "(b h w) t c -> b t h w c", b=B, h=H, w=W)
        out = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(
            out.astype(x.dtype)
        )
        return x + out


class CausalHybridDownsample3d(nn.Module):
    spatial_down: bool = True
    temporal_down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.spatial_down and not self.temporal_down:
            return x
        C = x.shape[-1]
        out = x
        if self.spatial_down:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            out = CausalConv3d(
                C, (1, 3, 3), stride=2, dtype=self.dtype, name="conv_s1"
            )(out)
        if self.temporal_down:
            out = CausalConv3d(
                C, (3, 1, 1), time_stride=2, dtype=self.dtype, name="conv_t1"
            )(out)
        return CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="conv_mix")(out)


class CausalHybridUpsample3d(nn.Module):
    spatial_up: bool = True
    temporal_up: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.spatial_up and not self.temporal_up:
            return x
        C = x.shape[-1]
        if self.temporal_up:
            if x.shape[1] > 1:  # static shape decision (reference cosmos.py:267)
                x = jnp.repeat(x, 2, axis=1)
            x = CausalConv3d(C, (3, 1, 1), dtype=self.dtype, name="conv1")(x) + x
        if self.spatial_up:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = CausalConv3d(
                C, (1, 3, 3), padding=1, dtype=self.dtype, name="conv2"
            )(x) + x
        return CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="conv3")(x)


class SpatialCrossAttnBlock(nn.Module):
    """Motion queries attend to single-frame reference features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_motion, x_ref):
        C = x_motion.shape[-1]
        norm = CausalNormalize(dtype=self.dtype, name="norm")
        h_mot = norm(x_motion)
        h_ref = norm(x_ref)
        q = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="q")(h_mot)
        k = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="k")(h_ref)
        v = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="v")(h_ref)
        B, T, H, W, _ = q.shape
        qf = q.reshape(B, T, H * W, C).astype(jnp.float32)
        kf = k[:, 0].reshape(B, 1, H * W, C).astype(jnp.float32)
        vf = v[:, 0].reshape(B, 1, H * W, C).astype(jnp.float32)
        w = jax.nn.softmax(
            jnp.einsum("btqc,bskc->btqk", qf, kf) * (C**-0.5), axis=-1
        )
        out = jnp.einsum("btqk,bskc->btqc", w, vf).reshape(B, T, H, W, C)
        out = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(
            out.astype(x_motion.dtype)
        )
        return x_motion + out


class _EncHead(nn.Module):
    z_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CausalResnetBlockFactorized3d(
            dropout=self.dropout, dtype=self.dtype, name="mid_block1"
        )(x, train)
        h = CausalAttnBlock(dtype=self.dtype, name="mid_attn_s")(h)
        h = CausalTemporalAttnBlock(dtype=self.dtype, name="mid_attn_t")(h)
        h = CausalResnetBlockFactorized3d(
            dropout=self.dropout, dtype=self.dtype, name="mid_block2"
        )(h, train)
        h = nn.silu(CausalNormalize(dtype=self.dtype, name="norm")(h))
        h = CausalConv3d(
            self.z_channels, (1, 3, 3), padding=1, dtype=self.dtype, name="out_s"
        )(h)
        return CausalConv3d(
            self.z_channels, (3, 1, 1), dtype=self.dtype, name="out_t"
        )(h)


class CosmosDualSharedEncoder(nn.Module):
    in_channels: int = 3
    channels: int = 64
    channels_mult: Sequence[int] = (1, 2, 4, 8, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    z_channels: int = 1024
    ref_target_stride: int = 16
    motion_target_stride: int = 32
    motion_temporal_down_count: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, C, T, H, W] -> (z_ref [B,z,1,h,w], z_mot [B,z,t',h',w'])."""
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # BTHWC
        ref_steps = int(math.log2(self.ref_target_stride))
        mot_steps = int(math.log2(self.motion_target_stride))
        max_steps = max(ref_steps, mot_steps)
        time_schedule = [i < self.motion_temporal_down_count for i in range(max_steps)]

        conv_in_s = CausalConv3d(
            self.channels, (1, 3, 3), padding=1, dtype=self.dtype,
            name="conv_in_s",
        )
        conv_in_t = CausalConv3d(
            self.channels, (3, 1, 1), dtype=self.dtype, name="conv_in_t"
        )
        conv_in = lambda v: conv_in_t(conv_in_s(v))

        x_ref, x_mot = x[:, :1], x[:, 1:]
        # shared stem + shared tower weights applied to both branches
        h_ref = conv_in(x_ref)
        h_mot = conv_in(x_mot) if x_mot.shape[1] > 0 else None

        curr_res = 1
        for i in range(max_steps):
            mult = (
                self.channels_mult[i]
                if i < len(self.channels_mult)
                else self.channels_mult[-1]
            )
            out_ch = self.channels * mult
            blocks = [
                CausalResnetBlockFactorized3d(
                    out_channels=out_ch, dropout=self.dropout,
                    dtype=self.dtype, name=f"layer{i}_block{j}",
                )
                for j in range(self.num_res_blocks)
            ]
            attns = []
            for j in range(self.num_res_blocks):
                if curr_res in self.attn_resolutions:
                    attns.append((
                        CausalAttnBlock(dtype=self.dtype, name=f"layer{i}_attn_s{j}"),
                        CausalTemporalAttnBlock(dtype=self.dtype, name=f"layer{i}_attn_t{j}"),
                    ))
                else:
                    attns.append(None)

            def tower(v):
                for blk, at in zip(blocks, attns):
                    v = blk(v, train)
                    if at is not None:
                        v = at[1](at[0](v))
                return v

            if i < ref_steps:
                h_ref = tower(h_ref)
                h_ref = CausalHybridDownsample3d(
                    spatial_down=True, temporal_down=False,
                    dtype=self.dtype, name=f"layer{i}_ref_down",
                )(h_ref)
            if h_mot is not None and i < mot_steps:
                h_mot = tower(h_mot)
                h_mot = CausalHybridDownsample3d(
                    spatial_down=True, temporal_down=time_schedule[i],
                    dtype=self.dtype, name=f"layer{i}_mot_down",
                )(h_mot)
            curr_res *= 2

        z_ref = _EncHead(
            self.z_channels, self.dropout, dtype=self.dtype, name="ref_head"
        )(h_ref, train)
        z_mot = (
            _EncHead(
                self.z_channels, self.dropout, dtype=self.dtype, name="mot_head"
            )(h_mot, train)
            if h_mot is not None
            else None
        )
        to_cf = lambda v: jnp.transpose(v, (0, 4, 1, 2, 3))  # BCTHW
        return to_cf(z_ref), (to_cf(z_mot) if z_mot is not None else None)


class CosmosDualSharedDecoder(nn.Module):
    out_channels: int = 3
    channels: int = 64
    channels_mult: Sequence[int] = (1, 2, 4, 8, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    z_channels: int = 1024
    spatial_compression: int = 16
    motion_spatial_compression: int = 32
    motion_temporal_compression: int = 4
    cross_attn_resolutions: Sequence[int] = (16, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_ref, z_mot, train: bool = False):
        """z_ref/z_mot: [B, z, T, H, W] -> video [B, C, T_out, H_out, W_out]."""
        to_cl = lambda v: jnp.transpose(v, (0, 2, 3, 4, 1))
        z_ref = to_cl(z_ref)
        z_mot = to_cl(z_mot)
        ref_level_idx = int(math.log2(self.spatial_compression)) - 1
        mot_level_idx = int(math.log2(self.motion_spatial_compression)) - 1
        block_in_ref = self.channels * self.channels_mult[ref_level_idx]
        block_in_mot = self.channels * self.channels_mult[mot_level_idx]

        # motion adapter: bring motion latents up to the ref spatial scale
        h_mot = CausalConv3d(
            block_in_mot, (1, 1, 1), dtype=self.dtype, name="mot_conv_in1"
        )(z_mot)
        h_mot = CausalConv3d(
            block_in_mot, (1, 1, 1), dtype=self.dtype, name="mot_conv_in2"
        )(h_mot)
        curr_ch = block_in_mot
        for ai, i_level in enumerate(range(mot_level_idx, ref_level_idx, -1)):
            target_ch = self.channels * self.channels_mult[i_level - 1]
            for j in range(self.num_res_blocks):
                h_mot = CausalResnetBlockFactorized3d(
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"adapter{ai}_block{j}",
                )(h_mot, train)
            h_mot = CausalHybridUpsample3d(
                spatial_up=True, temporal_up=False, dtype=self.dtype,
                name=f"adapter{ai}_up",
            )(h_mot)
            if curr_ch != target_ch:
                h_mot = CausalConv3d(
                    target_ch, (1, 1, 1), dtype=self.dtype,
                    name=f"adapter{ai}_proj",
                )(h_mot)
                curr_ch = target_ch

        # ref adapter
        h_ref = CausalConv3d(
            block_in_ref, (3, 3, 3), padding=1, dtype=self.dtype,
            name="ref_conv_in",
        )(z_ref)
        h_ref = CausalResnetBlockFactorized3d(
            dropout=self.dropout, dtype=self.dtype, name="ref_mid1"
        )(h_ref, train)
        h_ref = CausalAttnBlock(dtype=self.dtype, name="ref_mid_attn")(h_ref)
        h_ref = CausalResnetBlockFactorized3d(
            dropout=self.dropout, dtype=self.dtype, name="ref_mid2"
        )(h_ref, train)

        # backbone with cross injections at configured scales; params shared
        # between the ref and motion streams (reference cosmos.py:473-488)
        block_in = block_in_ref
        top_scale = 2 ** (ref_level_idx + 1)
        if top_scale in self.cross_attn_resolutions:
            h_mot = SpatialCrossAttnBlock(
                dtype=self.dtype, name=f"inject_scale_{top_scale}"
            )(h_mot, h_ref)

        for li, i_level in enumerate(reversed(range(ref_level_idx + 1))):
            scale = 2 ** (i_level + 1)
            block_out = (
                self.channels * self.channels_mult[i_level - 1]
                if i_level > 0
                else self.channels
            )
            blocks = []
            attns = []
            for j in range(self.num_res_blocks + 1):
                blocks.append(
                    CausalResnetBlockFactorized3d(
                        out_channels=block_out, dropout=self.dropout,
                        dtype=self.dtype, name=f"up{li}_block{j}",
                    )
                )
                if scale in self.attn_resolutions:
                    attns.append((
                        CausalAttnBlock(dtype=self.dtype, name=f"up{li}_attn_s{j}"),
                        CausalTemporalAttnBlock(dtype=self.dtype, name=f"up{li}_attn_t{j}"),
                    ))
                else:
                    attns.append(None)
            block_in = block_out

            def tower(v):
                for blk, at in zip(blocks, attns):
                    v = blk(v, train)
                    if at is not None:
                        v = at[1](at[0](v))
                return v

            h_ref = tower(h_ref)
            h_mot = tower(h_mot)
            # mirror the encoder's motion_temporal_down_count: one temporal
            # up per temporal down, at scales (4, 8, ...) — hardcoding
            # (8, 4) silently desynchronized T_out from T under
            # mot_time_down != 2
            n_t_up = max(int(math.log2(self.motion_temporal_compression)), 0)
            temporal_up = scale in tuple(2 ** (k + 2) for k in range(n_t_up))
            h_mot = CausalHybridUpsample3d(
                spatial_up=True, temporal_up=temporal_up, dtype=self.dtype,
                name=f"up{li}_upsample_mot",
            )(h_mot)
            h_ref = CausalHybridUpsample3d(
                spatial_up=True, temporal_up=False, dtype=self.dtype,
                name=f"up{li}_upsample_ref",
            )(h_ref)
            current_scale = scale // 2
            if current_scale in self.cross_attn_resolutions and current_scale > 1:
                h_mot = SpatialCrossAttnBlock(
                    dtype=self.dtype, name=f"inject_scale_{current_scale}"
                )(h_mot, h_ref)

        h = jnp.concatenate([h_ref, h_mot], axis=1)  # along time
        h = nn.silu(CausalNormalize(dtype=self.dtype, name="norm_out")(h))
        out = CausalConv3d(
            self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)
        return jnp.transpose(out, (0, 4, 1, 2, 3))  # BCTHW


class FSQuantizerProj(nn.Module):
    """FSQ with Linear in/out projections, channel-first video layout."""

    levels: tuple = (8, 8, 8, 5, 5, 5)
    dim: int = 256

    def setup(self):
        self.fsq = FSQ(self.levels)
        token_dim = len(self.levels)
        if self.dim != token_dim:
            self.project_in = nn.Dense(token_dim, name="project_in")
            self.project_out = nn.Dense(self.dim, name="project_out")
        else:
            self.project_in = self.project_out = lambda v: v

    @property
    def codebook_size(self) -> int:
        return self.fsq.codebook_size

    def __call__(self, z):
        """z: [B, C, ...spatial] -> (quantized same shape, loss=0, indices)."""
        perm = (0,) + tuple(range(2, z.ndim)) + (1,)
        inv = (0, z.ndim - 1) + tuple(range(1, z.ndim - 1))
        zc = jnp.transpose(z, perm)  # channel-last
        proj = self.project_in(zc.astype(jnp.float32))
        codes, info = self.fsq(proj)
        out = self.project_out(codes)
        out = jnp.transpose(out, inv)
        return out.astype(z.dtype), jnp.asarray(0.0), info["indices"]

    def get_codebook_entry(self, indices):
        codes = self.fsq.indices_to_codes(indices).astype(jnp.float32)
        out = self.project_out(codes)  # [..., dim], channel-last
        perm = (0, out.ndim - 1) + tuple(range(1, out.ndim - 1))
        return jnp.transpose(out, perm)


class SimVQ(nn.Module):
    """Frozen Gaussian codebook + learnable projection (cosmos.py:772-875)."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    legacy: bool = True

    def setup(self):
        # frozen anchor codebook as a deterministic CONSTANT, not a param:
        # a param would receive adamw's decoupled weight decay even with
        # zero gradients (no trainer masks it), shrinking the anchors every
        # step and collapsing the quantization geometry they anchor
        self.embedding = (
            jax.random.normal(
                jax.random.PRNGKey(0), (self.n_e, self.e_dim), jnp.float32
            )
            * self.e_dim**-0.5
        )
        self.embedding_proj = nn.Dense(self.e_dim, name="embedding_proj")

    def _codebook(self):
        return self.embedding_proj(self.embedding)

    def __call__(self, z):
        """z: [B, C, ...] -> (quantized, loss, indices [B, ...spatial])."""
        perm = (0,) + tuple(range(2, z.ndim)) + (1,)
        inv = (0, z.ndim - 1) + tuple(range(1, z.ndim - 1))
        zc = jnp.transpose(z, perm).astype(jnp.float32)
        spatial_shape = zc.shape[:-1]
        zf = zc.reshape(-1, self.e_dim)
        codebook = self._codebook().astype(jnp.float32)
        idx = vq_lookup(zf, codebook, metric="l2")
        z_q = jnp.take(codebook, idx, axis=0).reshape(zc.shape)
        if not self.legacy:
            loss = self.beta * jnp.mean(
                (jax.lax.stop_gradient(z_q) - zc) ** 2
            ) + jnp.mean((z_q - jax.lax.stop_gradient(zc)) ** 2)
        else:
            loss = jnp.mean(
                (jax.lax.stop_gradient(z_q) - zc) ** 2
            ) + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(zc)) ** 2)
        z_q = zc + jax.lax.stop_gradient(z_q - zc)
        z_q = jnp.transpose(z_q, inv).astype(z.dtype)
        return z_q, loss, idx.reshape(spatial_shape)

    def get_codebook_entry(self, indices):
        codebook = self._codebook()
        z_q = jnp.take(codebook, indices, axis=0)
        perm = (0, z_q.ndim - 1) + tuple(range(1, z_q.ndim - 1))
        return jnp.transpose(z_q, perm)


class CosmosVideoTokenizer(nn.Module):
    """'cosmos' (SimVQ) / 'cosmos_fsq' (FSQ) unified tokenizer."""

    quantizer_type: str = "simvq"  # 'simvq' | 'fsq'
    in_channels: int = 3
    base_channels: int = 128
    channel_multipliers: tuple = (1, 2, 4, 4)
    latent_dim: int = 256
    codebook_size: int = 16384  # simvq only
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    ref_stride: int = 8
    mot_stride: int = 16
    mot_time_down: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    bottleneck: Any = None
    prior_model: Any = None

    def setup(self):
        self.encoder = CosmosDualSharedEncoder(
            in_channels=self.in_channels,
            channels=self.base_channels,
            channels_mult=self.channel_multipliers,
            z_channels=self.latent_dim,
            ref_target_stride=self.ref_stride,
            motion_target_stride=self.mot_stride,
            motion_temporal_down_count=self.mot_time_down,
            dropout=self.dropout,
            dtype=self.dtype,
            name="encoder",
        )
        if self.quantizer_type == "simvq":
            self.quantizer = SimVQ(
                n_e=self.codebook_size, e_dim=self.latent_dim, beta=0.25,
                name="quantizer",
            )
        else:
            self.quantizer = FSQuantizerProj(
                levels=self.fsq_levels, dim=self.latent_dim, name="quantizer"
            )
        self.decoder = CosmosDualSharedDecoder(
            out_channels=self.in_channels,
            channels=self.base_channels,
            channels_mult=self.channel_multipliers,
            z_channels=self.latent_dim,
            spatial_compression=self.ref_stride,
            motion_spatial_compression=self.mot_stride,
            motion_temporal_compression=2**self.mot_time_down,
            cross_attn_resolutions=(8, 4, 2),
            dropout=self.dropout,
            dtype=self.dtype,
            name="decoder",
        )

    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        z_ref, z_mot = self.encoder(x, train=train)
        z_ref_q, loss_ref, ind_ref = self.quantizer(z_ref)
        if z_mot is None:
            # single-frame input has no motion branch; the dual decoder
            # structurally needs one — encode_indices supports T==1, full
            # reconstruction does not (same shape contract as the
            # reference's dual decoder, cosmos.py:389-490)
            raise ValueError(
                "CosmosVideoTokenizer reconstruction needs T > 1 (no "
                "motion latents for a single frame); use encode_indices "
                "for image-only encoding"
            )
        z_mot_q, loss_mot, ind_mot = self.quantizer(z_mot)
        recon = self.decoder(z_ref_q, z_mot_q, train=train)
        return {
            "pred_frames": recon,
            "loss_q": loss_ref + loss_mot,
            "ind_ref": ind_ref,
            "ind_mot": ind_mot,
        }

    def encode_indices(self, x):
        z_ref, z_mot = self.encoder(x)
        _, _, ind_ref = self.quantizer(z_ref)
        ind_mot = None
        if z_mot is not None:
            _, _, ind_mot = self.quantizer(z_mot)
        return ind_ref, ind_mot

    def decode_indices(self, ind_ref, ind_mot):
        if ind_mot is None:
            raise ValueError(
                "decode_indices needs motion indices (T > 1); the dual "
                "decoder cannot reconstruct from reference indices alone"
            )
        z_ref_q = self.quantizer.get_codebook_entry(ind_ref)
        z_mot_q = self.quantizer.get_codebook_entry(ind_mot)
        return self.decoder(z_ref_q, z_mot_q)


def _cosmos_factory(**overrides):
    fields = set(CosmosVideoTokenizer.__dataclass_fields__)
    return CosmosVideoTokenizer(
        quantizer_type="simvq",
        **{k: v for k, v in overrides.items() if k in fields and k != "quantizer_type"},
    )


def _cosmos_fsq_factory(**overrides):
    import numpy as _np

    fields = set(CosmosVideoTokenizer.__dataclass_fields__)
    kw = {k: v for k, v in overrides.items()
          if k in fields and k != "quantizer_type"}
    # model.codebook_size must report the FSQ vocabulary (prod of levels),
    # not the simvq default — consumers size vocab/histograms from it
    levels = tuple(kw.get("fsq_levels", (8, 8, 8, 5, 5, 5)))
    kw["codebook_size"] = int(_np.prod(levels))
    return CosmosVideoTokenizer(quantizer_type="fsq", **kw)


models.update({"cosmos": _cosmos_factory, "cosmos_fsq": _cosmos_fsq_factory})
