"""TiTok: variable-resolution / variable-token packed-sequence tokenizer.

Re-expresses `/root/reference/models/model_titok/` TPU-first:
  * the CUDA `flash_attn_varlen_func` + `cu_seqlens` packing
    (base/transformer.py:32-63) becomes ONE padded packed sequence with
    per-token `segment_ids` driven through the Pallas flash-attention
    kernel — cross-segment pairs are masked in-kernel, the TPU-native
    equivalent of varlen attention (SURVEY.md §2.4 item 1).
  * GQA with [Q-heads, KV-heads] per model size (base/blocks.py:32-64),
    pre-LN + QK-norm + GEGLU blocks (no LNS scaling here), per-sample
    Lumina2 3-axis RoPE with CONCATENATED per-axis tables
    (base/rope.py:49-129; note: not interleaved like model_new).
  * encoder packs [latent mask tokens ‖ patch tokens] per sample; decoder
    packs [latent tokens ‖ pixel mask tokens]; outputs are per-sample CTHW
    videos (base/blocks.py:82-230).

Shapes: per-sample grids and token counts are Python-static at trace time.
Uniform batches take a BATCHED [B, L] attention fast path (no packing);
heterogeneous batches pack into one padded [1, sum(L_i)] sequence — callers
can bucket shape sets to a fixed length via pack_segments' pad_to so each
bucket compiles once (SURVEY.md §7 hard parts).

Registered: 'titok' (base size, FSQ[8,8,8,5,5,5]).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from ..ops.rope import apply_rotary, mrope_cos_sin
from ..registry import models
from .fsq import FSQ
from .model_new import _trunc02


def get_titok_model_dims(model_size="tiny", head_dim=64, mlp_ratio=4.0):
    if model_size.endswith("_thin"):
        model_size = model_size[:-5]
        layers = {"tiny": 2, "small": 5, "base": 7, "large": 8}[model_size]
        heads = {"tiny": (8, 2), "small": (12, 4), "base": (16, 4), "large": (32, 8)}[model_size]
        mlp_ratio = mlp_ratio / 2
    else:
        layers = {"tiny": 4, "small": 8, "base": 12, "large": 24}[model_size]
        heads = {"tiny": (4, 2), "small": (8, 2), "base": (12, 4), "large": (16, 4)}[model_size]
    return int(head_dim * heads[0]), layers, heads, mlp_ratio


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pack_segments(
    parts: List[jax.Array], pad_to: Optional[int] = None
) -> Tuple[jax.Array, jax.Array, List[int]]:
    """Pack [Li, C] parts -> ([1, L_pad, C], segment_ids [1, L_pad], lens)."""
    lens = [int(p.shape[0]) for p in parts]
    total = sum(lens)
    L_pad = pad_to or _round_up(total, 128)
    x = jnp.concatenate(parts, axis=0)
    x = jnp.pad(x, ((0, L_pad - total), (0, 0)))
    seg = np.full((L_pad,), -1, np.int32)
    off = 0
    for i, l in enumerate(lens):
        seg[off : off + l] = i
        off += l
    return x[None], jnp.asarray(seg)[None], lens


class PackedGQAAttention(nn.Module):
    dim: int
    q_heads: int
    kv_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids):
        """x: [B, L, C]; cos/sin: [L, hd/2]; segment_ids: [B, L] or None
        (None = uniform batch, no cross-sample masking needed)."""
        B, L, C = x.shape
        hd = self.dim // self.q_heads
        gqa_dim = hd * self.kv_heads
        h = nn.LayerNorm(dtype=self.dtype, name="pre_ln")(x)
        qkv = nn.Dense(
            gqa_dim * 2 + self.dim, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="to_qkv",
        )(h)
        q = qkv[..., : self.dim].reshape(B, L, self.q_heads, hd)
        k = qkv[..., self.dim : self.dim + gqa_dim].reshape(B, L, self.kv_heads, hd)
        v = qkv[..., self.dim + gqa_dim :].reshape(B, L, self.kv_heads, hd)
        q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
        k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        # K/V stay at kv_heads width: ops/attention streams each KV head
        # once per query group (h -> h//rep index map), so GQA's bandwidth
        # saving is realized instead of repeating K/V to q_heads here.
        out = attention(
            q, k, v, segment_ids=segment_ids, use_pallas=self.use_pallas
        ).reshape(B, L, C)
        return nn.Dense(
            self.dim, use_bias=False, kernel_init=_trunc02,
            dtype=self.dtype, name="out_proj",
        )(out)


class PackedBlockStack(nn.Module):
    dim: int
    depth: int
    q_heads: int
    kv_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids):
        for i in range(self.depth):
            x = x + PackedGQAAttention(
                self.dim, self.q_heads, self.kv_heads, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"attn_{i}",
            )(x, cos, sin, segment_ids)
            inner = int(self.mlp_ratio * (2 / 3) * self.dim)
            inner = 32 * ((inner + 31) // 32)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ffd_norm_{i}")(x)
            h = nn.Dense(
                inner * 2, use_bias=False, kernel_init=_trunc02,
                dtype=self.dtype, name=f"ffd_in_{i}",
            )(h)
            a, gate = jnp.split(h, 2, axis=-1)
            h = nn.gelu(gate, approximate=False) * a
            x = x + nn.Dense(
                self.dim, use_bias=False, kernel_init=_trunc02,
                dtype=self.dtype, name=f"ffd_out_{i}",
            )(h)
        return x


class TiTokEncoder(nn.Module):
    model_size: str = "base"
    patch_size: Sequence[int] = (4, 8, 8)
    out_channels: int = 6
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x_list: List[jax.Array], token_counts: List[int]):
        """x_list: per-sample [C, T, H, W] (static shapes). Returns packed
        latent tokens [sum(token_counts), out_channels]."""
        width, depth, heads, mlp_ratio = get_titok_model_dims(self.model_size)
        hd = width // heads[0]
        pt, ph, pw = self.patch_size
        scale = width**-0.5
        mask_token = self.param(
            "mask_token", lambda k, s: scale * jax.random.normal(k, s), (1, width)
        )
        proj_in = nn.Dense(
            width, kernel_init=_trunc02, dtype=self.dtype, name="proj_in"
        )
        stack = PackedBlockStack(
            width, depth, heads[0], heads[1], mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="blocks",
        )

        grids = [
            [d // p for d, p in zip(v.shape[1:], self.patch_size)]
            for v in x_list
        ]
        uniform = (
            len(set(map(tuple, grids))) == 1 and len(set(token_counts)) == 1
        )
        if uniform and len(x_list) > 1:
            # homogeneous batch: run [B, L] BATCHED attention instead of one
            # [1, B*L] packed sequence — packing costs O((B*L)^2) attention
            # FLOPs and a VMEM K/V footprint linear in batch size for zero
            # benefit when every sample shares one grid
            n_tok = token_counts[0]
            v = jnp.stack(x_list, axis=0)
            patches = einops.rearrange(
                v, "b c (t pt) (h p1) (w p2) -> b (t h w) (c pt p1 p2)",
                pt=pt, p1=ph, p2=pw,
            ).astype(self.dtype)
            tokens = proj_in(patches)
            B = tokens.shape[0]
            masked = jnp.broadcast_to(
                mask_token.astype(tokens.dtype), (B, n_tok, width)
            )
            hseq = jnp.concatenate([masked, tokens], axis=1)
            c, s = mrope_cos_sin(n_tok, grids[0], hd, interleave=False)
            hseq = stack(hseq, jnp.asarray(c), jnp.asarray(s), None)
            out = hseq[:, :n_tok].reshape(B * n_tok, width)
        else:
            parts, cos_parts, sin_parts = [], [], []
            for v, grid, n_tok in zip(x_list, grids, token_counts):
                patches = einops.rearrange(
                    v, "c (t pt) (h p1) (w p2) -> (t h w) (c pt p1 p2)",
                    pt=pt, p1=ph, p2=pw,
                ).astype(self.dtype)
                tokens = proj_in(patches)
                masked = jnp.broadcast_to(
                    mask_token.astype(tokens.dtype), (n_tok, width)
                )
                parts.append(jnp.concatenate([masked, tokens], axis=0))
                c, s = mrope_cos_sin(n_tok, grid, hd, interleave=False)
                cos_parts.append(c)
                sin_parts.append(s)

            packed, seg, lens = pack_segments(parts)
            L_pad = packed.shape[1]
            cos = np.concatenate(cos_parts, axis=0)
            sin = np.concatenate(sin_parts, axis=0)
            cos = jnp.asarray(np.pad(cos, ((0, L_pad - cos.shape[0]), (0, 0))))
            sin = jnp.asarray(np.pad(sin, ((0, L_pad - sin.shape[0]), (0, 0))))

            h = stack(packed, cos, sin, seg)[0]

            outs = []
            off = 0
            for l, n_tok in zip(lens, token_counts):
                outs.append(h[off : off + n_tok])
                off += l
            out = jnp.concatenate(outs, axis=0)
        out = nn.LayerNorm(name="ln_post")(out.astype(jnp.float32))
        return nn.Dense(
            self.out_channels, kernel_init=_trunc02, name="proj_out"
        )(out)


class TiTokDecoder(nn.Module):
    model_size: str = "base"
    patch_size: Sequence[int] = (4, 8, 8)
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, token_counts: List[int],
        grids: List[Sequence[int]],
    ) -> List[jax.Array]:
        """x: packed [sum(token_counts), token_size]; grids: per-sample CTHW
        video shapes (c, T, H, W). Returns a list of CTHW videos."""
        width, depth, heads, mlp_ratio = get_titok_model_dims(self.model_size)
        hd = width // heads[0]
        pt, ph, pw = self.patch_size
        scale = width**-0.5
        mask_token = self.param(
            "mask_token", lambda k, s: scale * jax.random.normal(k, s), (1, width)
        )
        patch_grids = [
            [d // p for d, p in zip(g[1:], self.patch_size)] for g in grids
        ]
        grid_sizes = [int(np.prod(g)) for g in patch_grids]

        h = nn.Dense(width, kernel_init=_trunc02, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        ln_pre = nn.LayerNorm(dtype=self.dtype, name="ln_pre")
        stack = PackedBlockStack(
            width, depth, heads[0], heads[1], mlp_ratio, dtype=self.dtype,
            use_pallas=self.use_pallas, name="blocks",
        )
        proj_out = nn.Dense(
            self.out_channels * pt * ph * pw, kernel_init=_trunc02,
            name="proj_out",
        )
        uniform = (
            len(set(map(tuple, patch_grids))) == 1
            and len(set(token_counts)) == 1
        )
        if uniform and len(token_counts) > 1:
            # homogeneous batch: batched attention (see TiTokEncoder)
            B = len(token_counts)
            n_tok, gs, pg = token_counts[0], grid_sizes[0], patch_grids[0]
            latents = h.reshape(B, n_tok, width)
            masked = jnp.broadcast_to(
                mask_token.astype(h.dtype), (B, gs, width)
            )
            hseq = ln_pre(jnp.concatenate([latents, masked], axis=1))
            c, s = mrope_cos_sin(n_tok, pg, hd, interleave=False)
            out = stack(hseq, jnp.asarray(c), jnp.asarray(s), None)
            pix = proj_out(out[:, n_tok:].astype(jnp.float32))
            return list(einops.rearrange(
                pix, "b (t h w) (c pt p1 p2) -> b c (t pt) (h p1) (w p2)",
                t=pg[0], h=pg[1], w=pg[2], c=self.out_channels,
                pt=pt, p1=ph, p2=pw,
            ))

        parts, cos_parts, sin_parts = [], [], []
        off = 0
        for n_tok, gs, pg in zip(token_counts, grid_sizes, patch_grids):
            latents = h[off : off + n_tok]
            off += n_tok
            masked = jnp.broadcast_to(mask_token.astype(h.dtype), (gs, width))
            parts.append(jnp.concatenate([latents, masked], axis=0))
            c, s = mrope_cos_sin(n_tok, pg, hd, interleave=False)
            cos_parts.append(c)
            sin_parts.append(s)

        packed, seg, lens = pack_segments(parts)
        packed = ln_pre(packed)
        L_pad = packed.shape[1]
        cos = np.concatenate(cos_parts, axis=0)
        sin = np.concatenate(sin_parts, axis=0)
        cos = jnp.asarray(np.pad(cos, ((0, L_pad - cos.shape[0]), (0, 0))))
        sin = jnp.asarray(np.pad(sin, ((0, L_pad - sin.shape[0]), (0, 0))))

        out = stack(packed, cos, sin, seg)[0]

        videos = []
        off = 0
        for l, n_tok, pg in zip(lens, token_counts, patch_grids):
            pix = out[off + n_tok : off + l]
            off += l
            pix = proj_out(pix.astype(jnp.float32))
            videos.append(
                einops.rearrange(
                    pix, "(t h w) (c pt p1 p2) -> c (t pt) (h p1) (w p2)",
                    t=pg[0], h=pg[1], w=pg[2], c=self.out_channels,
                    pt=pt, p1=ph, p2=pw,
                )
            )
        return videos


class TiTok(nn.Module):
    model_size: str = "base"
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    num_latent_tokens: int = 1024
    input_size: int = 128
    frame_num: int = 16
    patch_size: tuple = (4, 8, 8)
    in_channels: int = 3
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

    def setup(self):
        self.encoder = TiTokEncoder(
            model_size=self.model_size, patch_size=self.patch_size,
            out_channels=len(self.fsq_levels), dtype=self.dtype,
            use_pallas=self.use_pallas, name="encoder",
        )
        self.quantize = FSQ(self.fsq_levels)
        self.decoder = TiTokDecoder(
            model_size=self.model_size, patch_size=self.patch_size,
            out_channels=self.in_channels,
            dtype=self.dtype, use_pallas=self.use_pallas, name="decoder",
        )

    def encode_packed(self, x_list, token_counts):
        z = self.encoder(x_list, token_counts)
        x_q, info = self.quantize(z)
        return x_q, info["indices"]

    def decode_packed(self, x_q, token_counts, grids):
        return self.decoder(x_q, token_counts, grids)

    def decode_from_bottleneck(self, indices, grids=None):
        """Uniform-protocol entry (matches every other family, so sample.py
        / the AR trainer work unchanged): `indices` [B, N] int with
        grids=None decodes at the configured frame_num/input_size. The
        heterogeneous form — a LIST of per-sample index arrays plus
        explicit grids — is kept for packed use."""
        if not isinstance(indices, (list, tuple)):
            B, N = indices.shape
            if grids is None:
                grids = [
                    (self.in_channels, self.frame_num,
                     self.input_size, self.input_size)
                ] * B
            codes = self.quantize.indices_to_codes(
                indices.reshape(B * N)
            ).astype(jnp.float32)
            return jnp.stack(self.decoder(codes, [N] * B, grids), axis=0)
        indices_list = indices
        token_counts = [int(i.shape[0]) for i in indices_list]
        codes = self.quantize.indices_to_codes(
            jnp.concatenate(indices_list, axis=0)
        ).astype(jnp.float32)
        return self.decoder(codes, token_counts, grids)

    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        """x: [B, C, T, H, W] batch (uniform shapes -> uniform token counts).
        Heterogeneous batches: use encode_packed/decode_packed directly."""
        B = x.shape[0]
        x_list = [x[i] for i in range(B)]
        token_counts = [self.num_latent_tokens] * B
        grids = [tuple(v.shape) for v in x_list]
        x_q, indices = self.encode_packed(x_list, token_counts)
        videos = self.decode_packed(x_q, token_counts, grids)
        pred = jnp.stack(videos, axis=0)
        return {
            "pred_frames": pred,
            "bottleneck_rep": indices.reshape(B, self.num_latent_tokens),
            "loss_q": jnp.asarray(0.0),
        }


def _titok_factory(**overrides):
    fields = set(TiTok.__dataclass_fields__)
    return TiTok(**{k: v for k, v in overrides.items() if k in fields})


models.update({"titok": _titok_factory})
