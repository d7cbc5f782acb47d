"""LARP_AR: llama-style causal transformer prior over tokenizer codes (Flax).

Re-expresses `/root/reference/models/larp_ar.py` TPU-first:
  * ModelArgs dataclass (larp_ar.py:33-64); token+class embeddings with CFG
    class dropout (larp_ar.py:246-257); learned or fixed sin-cos absolute PE
    (larp_ar.py:269-276); RMSNorm -> GQA attention (fused wqkv) -> SwiGLU
    FFN (2/3*4d rounded to multiple_of) blocks with DropPath
    (larp_ar.py:127-230); zero-init output head (larp_ar.py:285-286).
  * The torch `KVCache` buffer mutated via `input_pos` indexing
    (larp_ar.py:146-161) becomes an explicit functional cache pytree — a
    tuple of per-layer {'k','v': [B, S, n_kv_head * head_dim]} — updated with
    `lax.dynamic_update_slice`, carried through the compiled decode loop in
    `generation.generate`, so updates are in-place in XLA. (Per-layer buffers
    rather than one stacked [L, ...] array: see Attention.prefill.)
  * Three forward modes (larp_ar.py:334-395): teacher-forcing training
    (`__call__`, Pallas causal flash attention), `prefill`, and single-token
    `decode_step` (cache-read attention; bandwidth-bound matvec).
  * Size zoo llama-abs-S..XXXL (larp_ar.py:440-469).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sincos
from ..ops.attention import attention
from ..ops.decode_attention import _quantize_rows, decode_attention
from ..registry import models
from .embed import LabelEmbedder


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


@dataclasses.dataclass(frozen=True)
class ModelArgs:
    dim: int = 4096
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    initializer_range: float = 0.02

    token_dropout_p: float = 0.1
    attn_dropout_p: float = 0.0
    resid_dropout_p: float = 0.1
    ffn_dropout_p: float = 0.1
    drop_path_rate: float = 0.0

    num_classes: int = 101
    class_dropout_prob: float = 0.1
    model_type: str = "class_cond"

    vocab_size: int = 8192
    cls_token_num: int = 1
    max_seq_len: int = 1024
    use_fixed_pe: bool = False
    frame_prediction: bool = False
    # gradient checkpointing: recompute each block in the backward pass
    # (jax.checkpoint via nn.remat) — trades ~30% step FLOPs for O(n_layer)x
    # less activation memory; for XXL/XXXL training and long sequences.
    remat: bool = False
    # int8 weight-only serving: every projection becomes a QuantDense
    # (kernel int8 + per-output-channel fp32 scale); XLA fuses the dequant
    # into the matmul. Decode is bound by weight streaming, so halving the
    # weight bytes is a measured 1.65x tokens/s over bf16 (see the
    # QuantDense docstring for the r5 A/B that retired the two alternative
    # algebras). Inference-only: convert a trained checkpoint with
    # `quantize_params`.
    quantized: bool = False


def _normal_init(std):
    return nn.initializers.normal(std)


class QuantDense(nn.Module):
    """Weight-only int8 linear (no bias): y = (x @ w8.astype(x.dtype)) * s,
    with w8 int8 and s the per-output-channel fp32 dequant scale. Matmul
    math matches nn.Dense (input dtype, e.g. bf16); built by
    `quantize_params`.

    The plain XLA form is the FASTEST of the three algebras tried across
    rounds 2-4, settled by an on-chip bisect A/B at identical HEAD
    (2026-08-21, 632M llama-abs-LP, b=8/CFG/int8-KV, same chip, warm cache):

      * this form (r2):                       3660 tok/s   (b32: 5000)
      * dynamic w8a8 s8xs8 (r3, b4eca4a):     3378 tok/s
      * Pallas in-VMEM dequant (r3 snapshot
        3f8ac7f, `ops/quant_matmul.w8_matmul`): 3000 tok/s (b32: 4613)

    The r3 theory that XLA hoists a bf16 weight copy out of the decode
    loop (making int8 serve at bf16 speed) is contradicted by both the r2
    artifact (bf16 2216 vs int8 2819 tok/s) and the A/B above — the scan
    body re-reads the int8 kernel each step and fuses the convert into the
    matmul. The two slower algebras shipped without a same-HEAD on-chip
    A/B; `ops/quant_matmul.py` survives for microbench tooling only."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.zeros, (x.shape[-1], self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = jax.lax.dot_general(
            x, kernel.astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        return y * scale.astype(y.dtype)


def _dense(cfg: "ModelArgs", features: int, kernel_init, name: str):
    if cfg.quantized:
        return QuantDense(features, name=name)
    return nn.Dense(
        features, use_bias=False, kernel_init=kernel_init, name=name
    )


_QUANT_TARGETS = ("wqkv", "wo", "w1", "w2", "w3", "output")


def quantize_params(params):
    """Convert a trained (float) LARP_AR param tree into the tree a
    `quantized=True` model expects: every projection kernel becomes
    {kernel: int8, scale: fp32[N]} via symmetric per-output-channel
    quantization. Embeddings, norms, and the PE stay float (negligible
    decode traffic)."""

    def walk(tree):
        out = {}
        for name, sub in tree.items():
            if name in _QUANT_TARGETS and isinstance(sub, dict) \
                    and "kernel" in sub:
                w = jnp.asarray(sub["kernel"], jnp.float32)
                scale = jnp.max(jnp.abs(w), axis=0) / 127.0
                scale = jnp.maximum(scale, 1e-8)
                q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
                out[name] = {"kernel": q, "scale": scale}
            elif isinstance(sub, dict):
                out[name] = walk(sub)
            else:
                out[name] = sub
        return out

    return walk(params)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return x * mask / keep


class FeedForward(nn.Module):
    config: ModelArgs

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        hidden = int(2 * (4 * cfg.dim) / 3)
        if cfg.ffn_dim_multiplier is not None:
            hidden = int(cfg.ffn_dim_multiplier * hidden)
        hidden = find_multiple(hidden, cfg.multiple_of)
        init = _normal_init(cfg.initializer_range)
        w1 = _dense(cfg, hidden, init, "w1")(x)
        w3 = _dense(cfg, hidden, init, "w3")(x)
        out = _dense(cfg, cfg.dim, init, "w2")(nn.silu(w1) * w3)
        return nn.Dropout(cfg.ffn_dropout_p, deterministic=not train)(out)


class Attention(nn.Module):
    config: ModelArgs

    def setup(self):
        cfg = self.config
        self.head_dim = cfg.dim // cfg.n_head
        self.n_head = cfg.n_head
        self.n_kv_head = cfg.n_kv_head or cfg.n_head
        total = (self.n_head + 2 * self.n_kv_head) * self.head_dim
        self.wqkv = _dense(
            cfg, total, _normal_init(cfg.initializer_range), "wqkv"
        )
        self.wo = _dense(
            cfg, cfg.dim, _normal_init(cfg.initializer_range), "wo"
        )
        self.resid_dropout = nn.Dropout(cfg.resid_dropout_p)

    def _split_qkv(self, x):
        B, S, _ = x.shape
        kv_size = self.n_kv_head * self.head_dim
        qkv = self.wqkv(x)
        q = qkv[..., : self.n_head * self.head_dim]
        k = qkv[..., self.n_head * self.head_dim : self.n_head * self.head_dim + kv_size]
        v = qkv[..., self.n_head * self.head_dim + kv_size :]
        q = q.reshape(B, S, self.n_head, self.head_dim)
        k = k.reshape(B, S, self.n_kv_head, self.head_dim)
        v = v.reshape(B, S, self.n_kv_head, self.head_dim)
        return q, k, v

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Teacher-forcing path: full causal self-attention."""
        B, S, _ = x.shape
        q, k, v = self._split_qkv(x)
        # GQA K/V stay at n_kv_head width — ops/attention streams each KV
        # head once per query group instead of materializing the repeat
        out = attention(q, k, v, causal=True)
        out = out.reshape(B, S, -1)
        out = self.wo(out)
        return self.resid_dropout(out, deterministic=not train)

    def _pad_kv_rows(self, lc, rows):
        """Zero-pad [B, T, Hkv*D] K/V rows to the cache's 128-aligned lane
        width (a no-op when Hkv*D is already a tile multiple). Zero pads do
        not change the per-row int8 quantization scale."""
        pad = lc["k"].shape[-1] - rows.shape[-1]
        if pad == 0:
            return rows
        return jnp.pad(rows, ((0, 0), (0, 0), (0, pad)))

    def _store(self, lc, rows_k, rows_v, start_pos):
        """Write [B, T, KV] K/V rows into the layer cache dict at row
        `start_pos`. One sublane-row write of the [B, S, KV] cache — cheap;
        a lane-dim update would RMW every tile in that lane's column (see
        ops/decode_attention.py design notes). int8 caches ('ks'/'vs' scale
        planes present) quantize per (batch, position) row."""
        rows_k = self._pad_kv_rows(lc, rows_k)
        rows_v = self._pad_kv_rows(lc, rows_v)
        B, T, _ = rows_k.shape
        # NOTE (r5 A/B, b32 int8-KV on-chip): the [B,1,KV] dynamic-update-
        # slice lowers as a tile RMW costing ~13 us per buffer (x60 buffers
        # = 11% of the b32 decode step) — but routing T==1 through the
        # Pallas windowed writer measured WORSE (46 us/call: its ALIGN+G
        # window and per-layer launch overhead are sized for speculative
        # G-chunks, not single rows). Kept XLA; the winning design would
        # defer all layers' row commits to ONE end-of-step kernel with the
        # current token's K/V merged into attention in-register.
        out = dict(lc)
        for name, sname, rows in (("k", "ks", rows_k), ("v", "vs", rows_v)):
            if sname in lc:
                q8, scale = _quantize_rows(rows)
                out[name] = jax.lax.dynamic_update_slice(
                    lc[name], q8, (0, start_pos, 0)
                )
                out[sname] = jax.lax.dynamic_update_slice(
                    lc[sname], scale.T.astype(lc[sname].dtype),
                    (start_pos, 0),
                )
            else:
                out[name] = jax.lax.dynamic_update_slice(
                    lc[name], rows.astype(lc[name].dtype), (0, start_pos, 0)
                )
        return out

    def _store_rows(self, lc, rows_k, rows_v, pos):
        """Write [B, G, KV] K/V rows at PER-ROW positions pos[b] + g (rows
        advance unevenly under speculative decoding). On TPU this is the
        Pallas windowed-DMA kernel (ops/cache_update.py) — XLA lowers the
        equivalent scatter as a full-cache rewrite (~527 us per [16,1024,
        1280] bf16 buffer, ~60 buffers/iter across target+draft layers,
        measured v5e), which alone made speculative decoding lose to the
        plain loop. Tiny/CPU geometries fall back to the XLA scatter inside
        `write_rows_per_row`."""
        from ..ops.cache_update import write_rows_per_row

        return write_rows_per_row(
            lc, self._pad_kv_rows(lc, rows_k), self._pad_kv_rows(lc, rows_v),
            pos,
        )

    def decode_chunk(self, x, pos, lc, key_valid=None):
        """G-token decode (speculative verification): x [B, G, dim] chunk
        hidden states, the g-th at absolute position pos[b] + g (pos: [B]
        int32). Writes the chunk's K/V at per-row positions, then attends
        each chunk token causally over the live prefix + earlier chunk
        tokens (ops.decode_attention.chunk_attention — live-prefix Pallas
        kernel on TPU, XLA einsum fallback elsewhere)."""
        from ..ops.decode_attention import chunk_attention

        B, G, _ = x.shape
        q, k, v = self._split_qkv(x)
        lc = self._store_rows(
            lc, k.reshape(B, G, -1), v.reshape(B, G, -1), pos
        )
        out = chunk_attention(
            q, lc["k"], lc["v"], pos, key_valid=key_valid,
            k_scale=lc.get("ks"), v_scale=lc.get("vs"),
            kv_heads=self.n_kv_head,
        )
        out = out.reshape(B, G, self.n_head * self.head_dim).astype(x.dtype)
        return self.wo(out), lc

    def prefill(self, x, lc, cond_mask=None):
        """Process S prompt tokens; writes this layer's cache dict IN PLACE
        (lc['k'|'v']: [B, S, Hkv * D], donated upstream). Per-layer arrays
        rather than one stacked [L, ...] buffer: XLA fuses the k+v updates of
        a layer into one kernel, and a fused kernel addressing >2 GiB of a
        stacked cache faults on TPU (int32 byte offsets) — per-layer buffers
        keep every kernel's address range small.
        cond_mask: optional [B, S] bool — invalid prompt positions are masked
        as attention KEYS (the reference's emb_masks, ar/generate.py:151-160)."""
        B, S, _ = x.shape
        q, k, v = self._split_qkv(x)
        lc = self._store(
            lc, k.reshape(B, S, -1), v.reshape(B, S, -1), 0
        )
        if cond_mask is not None:
            # masked positions get their own segment so a masked QUERY still
            # has valid keys (the other masked causal positions, incl.
            # itself) — otherwise an all-masked row degenerates to uniform
            # attention over everything. The reference instead restores the
            # diagonal (ar/generate.py:158-160, causal*(1-eye)+eye); both
            # schemes keep masked positions isolated from valid ones, so
            # sampled tokens are identical — only the (never-read) hidden
            # states AT masked positions differ.
            seg = jnp.where(cond_mask, 0, -5).astype(jnp.int32)
            out = attention(
                q, k, v, causal=True, segment_ids=seg, kv_segment_ids=seg
            ).reshape(B, S, -1)
        else:
            out = attention(q, k, v, causal=True).reshape(B, S, -1)
        return self.wo(out), lc

    def decode_step(self, x, input_pos, lc, key_valid=None):
        """One-token decode; updates one position of this layer's cache in
        place — no full-cache copies in the sampling loop.
        key_valid: optional [B, S_cache] bool masking invalid cache slots."""
        B = x.shape[0]
        q, k, v = self._split_qkv(x)  # [B,1,H,D], [B,1,Hkv,D]
        pos = input_pos.astype(jnp.int32)
        lc = self._store(lc, k.reshape(B, 1, -1), v.reshape(B, 1, -1), pos)
        out = decode_attention(
            q.reshape(B, self.n_head, self.head_dim), lc["k"], lc["v"], pos,
            key_valid=key_valid,
            k_scale=lc.get("ks"), v_scale=lc.get("vs"),
            kv_heads=self.n_kv_head,
        )
        out = out.reshape(B, 1, self.n_head * self.head_dim).astype(x.dtype)
        return self.wo(out), lc


def _apply_block(layer, x, train):
    """Module-first wrapper so nn.remat can lift a single block call."""
    return layer(x, train=train)


def ar_sequence_loss(logits, targets, valid=None):
    """Teacher-forcing CE as (sum of per-token NLL, token count) so callers
    that split the batch (pipeline microbatches, parallel/pp.py) can combine
    partial sums exactly; `sum / max(count, 1)` reproduces the reference's
    mean CE (larp_ar.py forward)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        logp.reshape(-1, logp.shape[-1]),
        targets.reshape(-1, 1), axis=-1,
    ).squeeze(-1)
    if valid is not None:
        v = jnp.repeat(valid[:, None], targets.shape[1], axis=1).reshape(-1)
        return jnp.sum(nll * v), jnp.sum(v)
    return jnp.sum(nll), jnp.asarray(nll.size, jnp.float32)


class TransformerBlock(nn.Module):
    config: ModelArgs
    drop_path_rate: float = 0.0

    def setup(self):
        cfg = self.config
        self.attention = Attention(cfg, name="attention")
        self.feed_forward = FeedForward(cfg, name="feed_forward")
        self.attention_norm = nn.RMSNorm(epsilon=cfg.norm_eps, name="attention_norm")
        self.ffn_norm = nn.RMSNorm(epsilon=cfg.norm_eps, name="ffn_norm")
        self.drop_path = DropPath(self.drop_path_rate, name="drop_path")

    def __call__(self, x, train: bool = False):
        h = x + self.drop_path(
            self.attention(self.attention_norm(x), train=train), train
        )
        return h + self.drop_path(
            self.feed_forward(self.ffn_norm(h), train=train), train
        )

    def prefill(self, x, lc, cond_mask=None):
        a, lc = self.attention.prefill(
            self.attention_norm(x), lc, cond_mask
        )
        h = x + a
        return h + self.feed_forward(self.ffn_norm(h)), lc

    def decode_step(self, x, input_pos, lc, key_valid=None):
        a, lc = self.attention.decode_step(
            self.attention_norm(x), input_pos, lc, key_valid
        )
        h = x + a
        return h + self.feed_forward(self.ffn_norm(h)), lc

    def decode_chunk(self, x, pos, lc, key_valid=None):
        a, lc = self.attention.decode_chunk(
            self.attention_norm(x), pos, lc, key_valid
        )
        h = x + a
        return h + self.feed_forward(self.ffn_norm(h)), lc


class LARP_AR(nn.Module):
    """AR prior. See module docstring. Video codes vocab + optional sep token."""

    config: ModelArgs

    @classmethod
    def from_pretrained(cls, name_or_path: str, version: str = "sd"):
        """Hub id or local checkpoint -> (module, params). Mirrors the
        reference's PyTorchModelHubMixin.from_pretrained (larp_ar.py:233)
        via the local converted-checkpoint cache (utils/model_io.py)."""
        from ..utils.model_io import load_model_pretrained

        return load_model_pretrained(name_or_path, version)

    from_checkpoint = from_pretrained

    @property
    def cls_token_num(self) -> int:
        return self.config.cls_token_num

    @property
    def max_seq_length(self) -> int:
        return self.config.max_seq_len

    @property
    def frame_prediction(self) -> bool:
        return self.config.frame_prediction

    @property
    def model_type(self) -> str:
        return self.config.model_type

    @property
    def num_classes(self) -> int:
        return self.config.num_classes

    def setup(self):
        cfg = self.config
        if cfg.frame_prediction:
            self.cls_embedding = None
            n_tok = cfg.vocab_size + 1  # + sep token
        else:
            assert cfg.model_type == "class_cond", "please check model type"
            self.cls_embedding = LabelEmbedder(
                cfg.num_classes, cfg.dim, cfg.class_dropout_prob,
                name="cls_embedding",
            )
            n_tok = cfg.vocab_size
        self.tok_embeddings = nn.Embed(
            n_tok, cfg.dim,
            embedding_init=_normal_init(cfg.initializer_range),
            name="tok_embeddings",
        )
        self.tok_dropout = nn.Dropout(cfg.token_dropout_p)

        dpr = np.linspace(0, cfg.drop_path_rate, cfg.n_layer)
        self.layers = [
            TransformerBlock(cfg, drop_path_rate=float(dpr[i]), name=f"layers_{i}")
            for i in range(cfg.n_layer)
        ]
        self.norm = nn.RMSNorm(epsilon=cfg.norm_eps, name="norm")
        self.output = _dense(
            cfg, cfg.vocab_size, nn.initializers.zeros, "output"
        )

        pe_len = cfg.max_seq_len + cfg.cls_token_num - 1
        if cfg.use_fixed_pe:
            self.abs_pe = jnp.asarray(
                sincos.sincos_1d(cfg.dim, np.arange(pe_len))
            ).reshape(1, pe_len, cfg.dim)
        else:
            self.abs_pe = self.param(
                "abs_pe", _normal_init(0.02), (1, pe_len, cfg.dim)
            )

    def _cond_embeddings(self, cond_idx, train):
        if self.frame_prediction:
            assert cond_idx.ndim == 2
            return self.tok_embeddings(cond_idx)
        emb = self.cls_embedding(cond_idx, train=train)
        return emb[:, None, :][:, : self.cls_token_num]

    def embed_inputs(self, idx, cond_idx, train: bool = False):
        """Input embeddings for the teacher-forcing trunk: cond + token
        embeddings, token dropout, absolute PE. Split out of __call__ so the
        pipeline-parallel runner (parallel/pp.py) can reuse the exact
        pre-trunk computation."""
        cond_embeddings = self._cond_embeddings(cond_idx, train)
        token_embeddings = self.tok_embeddings(idx)
        h = jnp.concatenate([cond_embeddings, token_embeddings], axis=1)
        h = self.tok_dropout(h, deterministic=not train)
        return h + self.abs_pe[:, : h.shape[1]].astype(h.dtype)

    def head(self, h):
        """Final norm + vocab projection + cls-token trim (post-trunk)."""
        logits = self.output(self.norm(h))
        return logits[:, self.cls_token_num - 1 :]

    def __call__(
        self,
        idx: Optional[jax.Array],
        cond_idx: Optional[jax.Array],
        targets: Optional[jax.Array] = None,
        valid: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Teacher-forcing forward (training / naive inference)."""
        h = self.embed_inputs(idx, cond_idx, train)

        # sequence-parallel activation constraint (identity unless tracing
        # under parallel.tp.sequence_parallel(mesh))
        from ..parallel.tp import seq_constraint

        h = seq_constraint(h)
        if self.config.remat:
            # remat only the teacher-forcing path — prefill/decode keep tiny
            # activations and would just pay the recompute
            block = nn.remat(_apply_block, static_argnums=(2,))
            for layer in self.layers:
                h = seq_constraint(block(layer, h, train))
        else:
            for layer in self.layers:
                h = seq_constraint(layer(h, train=train))
        logits = self.head(h)

        loss = None
        if targets is not None:
            nll_sum, n = ar_sequence_loss(logits, targets, valid)
            loss = nll_sum / jnp.maximum(n, 1)
        return logits, loss

    # ------------------------------------------------------------ sampling

    def init_cache(self, batch_size: int, max_seq_length: int, dtype=jnp.float32):
        """Per-layer KV cache: a tuple of {'k','v': [B, S, Hkv * head_dim]} —
        one pair of buffers per layer (not one stacked [L, ...] array, whose
        fused k+v update kernels fault on TPU past 2 GiB; see
        Attention.prefill). Heads fused into one lane-dense dim and S kept
        untiled so per-token updates stay cheap and the decode kernel's DMA
        slices are tile-aligned (ops/decode_attention.py design notes)."""
        cfg = self.config
        # 128 keeps S divisible by every Pallas decode block size
        # (ops.decode_attention); the reference rounds to 8 (larp_ar.py:318) —
        # extra slots are position-masked either way
        S = find_multiple(max_seq_length, 128)
        n_kv = cfg.n_kv_head or cfg.n_head
        head_dim = cfg.dim // cfg.n_head
        # lane width padded to the 128 tile: Mosaic DMA slices must be
        # 128-aligned in the lane dim, and GQA head counts (e.g. 5 KV heads
        # x 64 = 320) otherwise force the whole decode onto the slow XLA
        # fallback — the round-2 reason GQA serving LOST to MHA. Stores
        # zero-fill the pad lanes; attention consumers slice them off.
        shape = (batch_size, S, find_multiple(n_kv * head_dim, 128))
        if dtype == jnp.int8:
            # quantized cache: int8 rows + per-(position, batch) fp32 scale
            # planes, laid out [S, 128] so the decode kernel's per-block
            # slices stay tile-aligned (batch in the first B lanes)
            assert batch_size <= 128, "int8 cache supports batch <= 128"
            return tuple(
                {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "ks": jnp.zeros((S, 128), jnp.float32),
                    "vs": jnp.zeros((S, 128), jnp.float32),
                }
                for _ in range(cfg.n_layer)
            )
        return tuple(
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(cfg.n_layer)
        )

    def prefill(self, cond_idx: jax.Array, cache, cond_mask=None):
        """Run the conditioning prefix; fill cache; return last-pos logits.
        cond_mask: optional [B, T] bool (the reference's emb_masks)."""
        h = self._cond_embeddings(cond_idx, train=False)
        T = h.shape[1]
        h = h + self.abs_pe[:, :T].astype(h.dtype)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            h, lc = layer.prefill(h, lc, cond_mask)
            new_cache.append(lc)
        h = self.norm(h)
        logits = self.output(h[:, -1:])
        return logits, tuple(new_cache)

    def decode_step(self, idx: jax.Array, input_pos: jax.Array,
                    cache, key_valid=None):
        """idx: [B, 1] current token; input_pos: scalar absolute position."""
        h = self.tok_embeddings(idx)
        pe = jax.lax.dynamic_slice(
            self.abs_pe, (0, input_pos.astype(jnp.int32), 0),
            (1, 1, self.config.dim),
        )
        h = h + pe.astype(h.dtype)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            h, lc = layer.decode_step(h, input_pos, lc, key_valid)
            new_cache.append(lc)
        h = self.norm(h)
        logits = self.output(h)
        return logits, tuple(new_cache)

    def decode_chunk(self, idx: jax.Array, pos: jax.Array,
                     cache, key_valid=None):
        """Multi-token decode for speculative verification
        (generation/speculative.py): idx [B, G] chunk tokens, the g-th at
        absolute position pos[b] + g (pos: [B] int32 — rows advance unevenly
        under speculative acceptance). Returns logits [B, G, V] (logits[:, g]
        conditions on the prefix + chunk tokens 0..g) and the cache with the
        chunk's K/V written at the per-row positions. PE lookups clip to the
        table (chunk slots past the end of generation produce garbage logits
        that the caller never commits)."""
        h = self.tok_embeddings(idx)
        pe_len = self.abs_pe.shape[1]
        p = jnp.clip(
            pos[:, None] + jnp.arange(idx.shape[1])[None, :], 0, pe_len - 1
        )
        h = h + jnp.take(self.abs_pe[0], p, axis=0).astype(h.dtype)
        new_cache = []
        for layer, lc in zip(self.layers, cache):
            h, lc = layer.decode_chunk(h, pos, lc, key_valid)
            new_cache.append(lc)
        h = self.norm(h)
        logits = self.output(h)
        return logits, tuple(new_cache)


# ---------------------------------------------------------------- size zoo


def _zoo(n_layer, n_head, dim):
    def ctor(**kwargs):
        # Checkpoint meta stores the complete ModelArgs under the zoo name;
        # drop the size keys (fixed by the zoo entry) and unknown keys so
        # specs round-trip through save/load.
        fields = set(ModelArgs.__dataclass_fields__)
        kwargs = {
            k: v for k, v in kwargs.items()
            if k in fields and k not in ("n_layer", "n_head", "dim")
        }
        return LARP_AR(ModelArgs(n_layer=n_layer, n_head=n_head, dim=dim, **kwargs))

    return ctor


def _larp_ar_factory(**kwargs):
    """Registry entry taking flat ModelArgs kwargs (like the reference)."""
    fields = set(ModelArgs.__dataclass_fields__)
    return LARP_AR(ModelArgs(**{k: v for k, v in kwargs.items() if k in fields}))


larp_ar_models = {
    "larp_ar": _larp_ar_factory,
    "llama-abs-S": _zoo(12, 6, 384),     # 21.7M
    "llama-abs-B": _zoo(12, 12, 768),    # 111M
    "llama-abs-L": _zoo(24, 16, 1024),   # 343M
    "llama-abs-LP": _zoo(30, 20, 1280),  # 632M
    "llama-abs-XL": _zoo(36, 20, 1280),  # 775M
    "llama-abs-XXL": _zoo(48, 24, 1536), # 1.4B
    "llama-abs-XXXL": _zoo(48, 40, 2560),# 3.9B
}
models.update(larp_ar_models)
