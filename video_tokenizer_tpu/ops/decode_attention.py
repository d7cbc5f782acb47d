"""Single-token KV-cache decode attention for TPU (Pallas), with XLA fallback.

The AR sampling loop (reference ar/generate.py:105-123) is HBM-bandwidth
bound: every decoded token re-reads the whole KV cache. The plain XLA
formulation (einsum over fp32-upcast cache) materializes fp32 copies of K and
V in HBM — ~3x the cache traffic — and always reads all S cache slots even
though only `pos + 1` are live.

This kernel fixes both:
  * K/V stream from HBM in their stored dtype (bf16 cache halves traffic
    again); all softmax math is fp32 in VMEM, matching `ops.attention`'s
    training kernel, so incremental decode stays exact vs teacher forcing.
  * The current position arrives via scalar prefetch and the K/V block
    index map CLAMPS trailing blocks to the last live block: Pallas elides
    the copy when a block index repeats, so per-step traffic is
    ceil((pos+1)/block_s) blocks, not S — early decode steps read only the
    prefix they can attend to.

Layout: cache [B, S, Hkv, D] (the model's cache layout — a [1, block_s,
Hkv, D] block is one contiguous DMA); q [B, H, D] for the single current
token; GQA folded as H = Hkv * rep inside the kernel.

Public entry: `decode_attention(q, k_cache, v_cache, pos, key_valid=None)`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    pos_ref,  # scalar prefetch: [1] int32
    q_ref,  # [H, D]
    k_ref,  # [block_s, Hkv, D]
    v_ref,  # [block_s, Hkv, D]
    valid_ref,  # [1, block_s] int32 (all-ones when key_valid is None)
    o_ref,  # [H, D]
    m_ref,  # scratch [H, 1] fp32
    l_ref,  # scratch [H, 1] fp32
    acc_ref,  # scratch [H, D] fp32
    *,
    sm_scale: float,
    block_s: int,
    n_kv_head: int,
    rep: int,
):
    j = pl.program_id(1)
    pos = pos_ref[0]
    last_blk = pos // block_s

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last_blk)
    def _block():
        H, D = q_ref.shape
        # [H, D] -> [Hkv, rep, D]; cache block -> [Hkv, block_s, D]
        q = q_ref[...].astype(jnp.float32).reshape(n_kv_head, rep, D)
        k = jnp.swapaxes(k_ref[...].astype(jnp.float32), 0, 1)
        v = jnp.swapaxes(v_ref[...].astype(jnp.float32), 0, 1)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [Hkv, rep, block_s]

        k_pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_s), 2
        )
        mask = k_pos <= pos
        mask = jnp.logical_and(mask, valid_ref[...].reshape(1, 1, block_s) != 0)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        s2 = s.reshape(H, block_s)
        m_prev, l_prev = m_ref[...], l_ref[...]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s2 - m_new)  # [H, block_s]
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = m_new

        pv = jax.lax.dot_general(
            p.reshape(n_kv_head, rep, block_s), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(H, D)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _pallas_decode(q, k_cache, v_cache, pos, key_valid, sm_scale, block_s):
    B, H, D = q.shape
    _, S, Hkv, _ = k_cache.shape
    rep = H // Hkv
    num_blocks = pl.cdiv(S, block_s)
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    # carried as [B, 1, S] so the block's trailing dims are (1, block_s) with
    # the second-minor equal to the full array dim (TPU tiling rule), same as
    # segment ids in ops.attention
    if key_valid is None:
        valid = jnp.ones((B, 1, S), jnp.int32)
    else:
        valid = key_valid.astype(jnp.int32)[:, None, :]

    def kv_index(b, j, pos_ref):
        # trailing blocks (beyond the last live position) clamp to the last
        # live block: identical index -> Pallas skips the HBM copy.
        # lax.div (C-style): floor `//` adds a negative-operand fixup branch
        # the index-map lowering rejects; pos is always >= 0 here.
        return (b, jnp.minimum(j, jax.lax.div(pos_ref[0], jnp.int32(block_s))), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_blocks),
        in_specs=[
            pl.BlockSpec((None, H, D), lambda b, j, pos_ref: (b, 0, 0)),
            pl.BlockSpec((None, block_s, Hkv, D), kv_index),
            pl.BlockSpec((None, block_s, Hkv, D), kv_index),
            pl.BlockSpec(
                (None, 1, block_s),
                lambda b, j, pos_ref: (
                    b, 0, jnp.minimum(j, jax.lax.div(pos_ref[0], jnp.int32(block_s)))
                ),
            ),
        ],
        out_specs=pl.BlockSpec((None, H, D), lambda b, j, pos_ref: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, sm_scale=sm_scale, block_s=block_s,
        n_kv_head=Hkv, rep=rep,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(pos, q, k_cache, v_cache, valid)


def xla_decode_attention(q, k_cache, v_cache, pos, key_valid=None,
                         sm_scale=None):
    """Reference/fallback path in pure XLA. q: [B, H, D];
    k_cache/v_cache: [B, S, Hkv, D]; pos: scalar (last live key, inclusive)."""
    B, H, D = q.shape
    _, S, Hkv, _ = k_cache.shape
    rep = H // Hkv
    scale = sm_scale if sm_scale is not None else D ** -0.5
    qg = q.reshape(B, Hkv, rep, D)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg.astype(jnp.float32),
        k_cache.astype(jnp.float32),
    ) * scale
    valid = jnp.arange(S)[None, None, None, :] <= pos
    if key_valid is not None:
        valid = jnp.logical_and(valid, key_valid[:, None, None, :])
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgs,bshd->bhgd", probs, v_cache.astype(jnp.float32)
    )
    return out.reshape(B, H, D).astype(q.dtype)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    block_s: int = 128,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """One-token decode attention over a KV cache.

    q: [B, H, D] (current token); k_cache/v_cache: [B, S, Hkv, D] with
    H == Hkv * rep (GQA); pos: scalar int32 absolute position of the current
    token (its K/V must already be written to the cache); key_valid: optional
    [B, S] bool marking cache slots usable as keys (the emb_masks path).
    Returns [B, H, D] in q.dtype. `use_pallas=None` auto-selects.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S = k_cache.shape[1]
    if not use_pallas or S % block_s != 0:
        return xla_decode_attention(
            q, k_cache, v_cache, pos, key_valid, sm_scale
        )
    scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5
    return _pallas_decode(q, k_cache, v_cache, pos, key_valid, scale, block_s)
