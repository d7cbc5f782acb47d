"""Flash attention for TPU (Pallas), with XLA fallback.

This replaces every attention substrate the reference leans on:
  * CUDA flash-attn (`/root/reference/models/model_new/base/transformer.py:6,56`,
    `models/model_titok/base/transformer.py:7,61`)
  * torch fused SDPA (`models/larp_ar.py:205-209`, `models/gptc.py:67-69`, timm blocks)

Design notes (TPU-first):
  * One fused kernel, online-softmax, O(S) memory; logits accumulated in fp32
    on the MXU regardless of input dtype (bf16 inputs recommended).
  * Full K/V for a (batch, head) pair live in VMEM (seq<=8k, head_dim<=128
    comfortably fits); the grid tiles only the query dimension, so there is no
    K-block re-streaming from HBM.
  * `segment_ids` replaces the CUDA varlen `cu_seqlens` path: packed sequences
    use per-token integer ids; pairs attend iff their ids are EQUAL (pure
    equality — negative ids are not special). To mask padding from everything,
    give the padded QUERIES and KEYS distinct ids (internal pads use -1 for q
    vs -2 for k so they never match each other); a query whose id matches no
    key degenerates to uniform attention with zero custom-VJP grads — always
    give such rows at least a self-matching key.
  * Causal masking is positional (global indices), composed with segment masks.
  * Training: custom VJP with Pallas dq and dkv kernels (flash backward).

Internal layout notes: segment ids are carried as [B, 1, S] and LSE/delta as
[B, H, 1, S] so every Pallas block ends in an (1|8, 128k) tile-aligned 2-D tail.

Public entry: `attention(q, k, v, *, causal, segment_ids, sm_scale, use_pallas)`
with tensors shaped [B, S, H, D] (BSHD, the layout XLA prefers on TPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Interpret-mode switch for every Pallas kernel in ops/ (attention, decode
# attention, VQ): tests/CI run on CPU where the kernels would otherwise be
# dead code — `_INTERPRET = True` (tests/conftest.py fixture or manual)
# emulates them so kernel-vs-XLA parity is checkable without TPU hardware.
# Production TPU runs leave it False (compiled Mosaic).
_INTERPRET = False

# ambient ring-attention context (set by parallel.ring.ring_sequence; the
# threading.local lives HERE so ops.attention never imports parallel.ring
# at module scope — ring imports this module)
import threading as _threading  # noqa: E402

_ring_ambient = _threading.local()


def _pallas_call(*args, **kwargs):
    """pl.pallas_call with the module-level interpret switch applied."""
    return pl.pallas_call(*args, interpret=_INTERPRET, **kwargs)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(S: int, requested: int, base: int = 128) -> int:
    """Largest multiple-of-`base` divisor of round_up(S, base) that is
    <= requested (never below `base`).

    Using a divisor keeps the kernel's padded length at round_up(S, base),
    so at most base-1 pad rows are ever streamed/computed. Rounding S up to
    a full `requested` block instead can nearly double K/V HBM+VMEM traffic
    when S slightly exceeds a block boundary (e.g. Sk=3200 with block 3072
    used to pad to 6144; now block=640, padded length 3200)."""
    requested = max(requested, base)
    n = _round_up(S, base) // base
    best = 1
    for m in range(1, n + 1):
        if n % m == 0 and m * base <= requested:
            best = m
    return best * base


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
    *, sm_scale: float, causal: bool, block_k: int, kv_len: int, q_offset: int,
    has_segments: bool, kv_padded: bool,
):
    """Grid: (B, H, num_q_blocks). q_ref: [block_q, D]; k/v_ref: [Sk_p, D]."""
    block_q, head_dim = q_ref.shape
    qi = pl.program_id(2)

    # MXU operands stay in the INPUT dtype when it is bf16 — the data
    # carries no more precision than bf16 anyway, and fp32 MXU passes run
    # at ~1/4 the bf16 rate (upcasting measured the whole fwd at 51 TF/s,
    # 26% of peak, on the flagship S=3072 shape). fp32 inputs (CPU parity
    # tests) keep full-precision dots. Accumulation is fp32 either way.
    mxu = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[...].astype(mxu)
    num_kb = pl.cdiv(kv_len, block_k)
    # masking is elided entirely for full non-causal unpadded attention —
    # the common tokenizer encode path — saving the per-block VPU mask work
    need_mask = causal or has_segments or kv_padded

    m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    ) + q_offset
    qseg = qseg_ref[...].reshape(block_q, 1)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(mxu)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(mxu)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [block_q, block_k] fp32

        if need_mask:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_pos < kv_len
            if causal:
                mask = jnp.logical_and(mask, q_pos >= k_pos)
            if has_segments:
                kseg = kseg_ref[:, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
                mask = jnp.logical_and(mask, qseg == kseg)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        # probabilities in the MXU dtype for the p@v pass: p in [0,1], so
        # the 8-bit-mantissa error is ~1e-3 relative — well inside
        # attention's tolerance — and halves the matmul input traffic.
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(mxu), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    if causal:
        # Only iterate k blocks that intersect the causal lower triangle.
        max_kpos = (qi + 1) * block_q + q_offset
        num_kb_eff = jnp.minimum(num_kb, pl.cdiv(max_kpos, block_k))
    else:
        num_kb_eff = num_kb
    m, l, acc = jax.lax.fori_loop(0, num_kb_eff, body, (m0, l0, acc0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(l_safe)).reshape(1, block_q)


def _fwd_kernel_packed(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
    *, sm_scale: float, causal: bool, block_k: int, kv_len: int,
    q_offset: int, has_segments: bool, kv_padded: bool, n_head: int,
    head_dim: int, rep: int,
):
    """Lane-packed forward: q_ref [block_q, H*D], k/v_ref [Sk_p, Hkv*D] —
    the NATIVE layout the qkv projection produces, so the [B,S,H,D] ->
    [B,H,S,D] relayout copies the BHSD kernel needs (measured 9.5% of the
    flagship tokenizer forward, profiles/tokenizer_profile.json r5) never
    exist. Heads are a static python loop over 64/128-lane slices of the
    fused dim; each head runs the same online softmax as `_fwd_kernel`.
    Grid: (B, num_q_blocks). Inference-only (the custom-VJP training path
    keeps the BHSD kernels + transposes — see _flash_attention_bshd)."""
    block_q = q_ref.shape[0]
    qi = pl.program_id(1)
    mxu = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    num_kb = pl.cdiv(kv_len, block_k)
    need_mask = causal or has_segments or kv_padded

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    ) + q_offset
    qseg = qseg_ref[...].reshape(block_q, 1)
    if causal:
        max_kpos = (qi + 1) * block_q + q_offset
        num_kb_eff = jnp.minimum(num_kb, pl.cdiv(max_kpos, block_k))
    else:
        num_kb_eff = num_kb

    qall = q_ref[...]
    for h in range(n_head):
        q = qall[:, h * head_dim:(h + 1) * head_dim].astype(mxu)
        g = h // rep  # KV group of this query head

        def body(kb, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[pl.ds(kb * block_k, block_k),
                      g * head_dim:(g + 1) * head_dim].astype(mxu)
            v = v_ref[pl.ds(kb * block_k, block_k),
                      g * head_dim:(g + 1) * head_dim].astype(mxu)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            if need_mask:
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                mask = k_pos < kv_len
                if causal:
                    mask = jnp.logical_and(mask, q_pos >= k_pos)
                if has_segments:
                    kseg = kseg_ref[
                        :, pl.ds(kb * block_k, block_k)
                    ].reshape(1, block_k)
                    mask = jnp.logical_and(mask, qseg == kseg)
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(mxu), v,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m, l, acc = jax.lax.fori_loop(
            0, num_kb_eff, body,
            (
                jnp.full((block_q, 1), -jnp.inf, jnp.float32),
                jnp.zeros((block_q, 1), jnp.float32),
                jnp.zeros((block_q, head_dim), jnp.float32),
            ),
        )
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[:, h * head_dim:(h + 1) * head_dim] = (
            acc / l_safe
        ).astype(o_ref.dtype)


# K+V VMEM bytes above which the packed forward falls back to the BHSD
# kernel (whole fused-width K and V live in VMEM per program; v5e has
# 128 MB VMEM and the scores/acc temporaries need room too)
_PACKED_KV_VMEM_BUDGET = 48 * (1 << 20)


def _flash_fwd_packed(q, k, v, q_seg, k_seg, sm_scale, causal, block_q,
                      block_k, has_segments=True, causal_offset=None):
    """q: [B,Sq,H,D], k/v: [B,Sk,Hkv,D] (BSHD, the model's native layout).
    Returns out [B,Sq,H,D]. No relayout: the arrays are bitcast-reshaped to
    [B,S,heads*D] (free, row-major) and the kernel slices heads in VMEM."""
    B, Sq, H, D = q.shape
    Sk, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    Sq_p = _round_up(Sq, block_q)
    Sk_p = _round_up(Sk, block_k)
    q_offset = causal_offset if causal_offset is not None else Sk - Sq

    q2 = q.reshape(B, Sq, H * D)
    k2 = k.reshape(B, Sk, Hkv * D)
    v2 = v.reshape(B, Sk, Hkv * D)
    if Sq_p != Sq:
        q2 = jnp.pad(q2, ((0, 0), (0, Sq_p - Sq), (0, 0)))
    if Sk_p != Sk:
        k2 = jnp.pad(k2, ((0, 0), (0, Sk_p - Sk), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, Sk_p - Sk), (0, 0)))
    q_seg = _pad_seg(q_seg, Sq_p, -1)
    k_seg = _pad_seg(k_seg, Sk_p, -2)

    kernel = functools.partial(
        _fwd_kernel_packed, sm_scale=sm_scale, causal=causal,
        block_k=block_k, kv_len=Sk, q_offset=q_offset,
        has_segments=has_segments, kv_padded=(Sk_p != Sk),
        n_head=H, head_dim=D, rep=rep,
    )
    out = _pallas_call(
        kernel,
        grid=(B, Sq_p // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, H * D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Sk_p, Hkv * D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Sk_p, Hkv * D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((None, 1, Sk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, H * D), lambda b, i: (b, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sq_p, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * (1 << 20),
        ),
    )(q2, k2, v2, q_seg, k_seg)
    return out[:, :Sq].reshape(B, Sq, H, D)


def _packed_eligible(q, k, block_k) -> bool:
    B, Sq, H, D = q.shape
    Sk, Hkv = k.shape[1], k.shape[2]
    kv_bytes = 2 * _round_up(Sk, block_k) * Hkv * D * q.dtype.itemsize
    return (
        (H * D) % 128 == 0
        and (Hkv * D) % 128 == 0
        and D % 8 == 0
        and kv_bytes <= _PACKED_KV_VMEM_BUDGET
    )


def _flash_fwd(q, k, v, q_seg, k_seg, sm_scale, causal, block_q, block_k,
               has_segments=True, causal_offset=None):
    """q: [B,H,Sq,D], k/v: [B,Hkv,Sk,D] (H % Hkv == 0; GQA streams each KV
    head once per group via the h -> h//rep index map — the expanded
    [B,H,Sk,D] K/V never exists in HBM or VMEM), segs: [B,1,S].
    Returns out, lse[B,H,1,Sq_p]."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    assert H % k.shape[1] == 0, (H, k.shape[1])
    rep = H // k.shape[1]
    # block sizes arrive from _pick_block (divisors of round_up(S, 128)), so
    # the pads below are <=127 rows; explicit non-divisor blocks still work,
    # they just pad to a full block multiple.
    Sq_p = _round_up(Sq, block_q)
    Sk_p = _round_up(Sk, block_k)
    # causal alignment: query i attends to keys <= i + offset
    q_offset = causal_offset if causal_offset is not None else Sk - Sq

    if Sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    if Sk_p != Sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sk_p - Sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sk_p - Sk), (0, 0)))
    q_seg = _pad_seg(q_seg, Sq_p, -1)
    k_seg = _pad_seg(k_seg, Sk_p, -2)

    grid = (B, H, Sq_p // block_q)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal,
        block_k=block_k, kv_len=Sk, q_offset=q_offset,
        has_segments=has_segments, kv_padded=(Sk_p != Sk),
    )
    out, lse = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sk_p, D), lambda b, h, i: (b, h // rep, 0, 0)),
            pl.BlockSpec((None, None, Sk_p, D), lambda b, h, i: (b, h // rep, 0, 0)),
            pl.BlockSpec((None, 1, block_q), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((None, 1, Sk_p), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Sq_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, q_seg, k_seg)
    return out[:, :, :Sq], lse


def _pad_seg(seg, S_p, fill):
    S = seg.shape[-1]
    if S_p != S:
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, S_p - S)), constant_values=fill)
    return seg


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, sm_scale: float, causal: bool, block_k: int, kv_len: int, q_offset: int,
    has_segments: bool, kv_padded: bool,
):
    need_mask = causal or has_segments or kv_padded
    block_q, head_dim = q_ref.shape
    qi = pl.program_id(2)
    # bf16 MXU operands for bf16 inputs (fp32 runs the MXU at ~1/4 rate);
    # fp32 accumulation throughout — see _fwd_kernel
    mxu = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    q = q_ref[...].astype(mxu)
    do = do_ref[...].astype(mxu)
    lse = lse_ref[...].reshape(block_q, 1)
    delta = delta_ref[...].reshape(block_q, 1)
    qseg = qseg_ref[...].reshape(block_q, 1)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    ) + q_offset
    num_kb = pl.cdiv(kv_len, block_k)

    def body(kb, dq):
        k = k_ref[pl.ds(kb * block_k, block_k), :].astype(mxu)
        v = v_ref[pl.ds(kb * block_k, block_k), :].astype(mxu)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if need_mask:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_pos < kv_len
            if causal:
                mask = jnp.logical_and(mask, q_pos >= k_pos)
            if has_segments:
                kseg = kseg_ref[:, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
                mask = jnp.logical_and(mask, qseg == kseg)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * sm_scale).astype(mxu)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        max_kpos = (qi + 1) * block_q + q_offset
        num_kb_eff = jnp.minimum(num_kb, pl.cdiv(max_kpos, block_k))
    else:
        num_kb_eff = num_kb
    dq = jax.lax.fori_loop(
        0, num_kb_eff, body, jnp.zeros((block_q, head_dim), jnp.float32)
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    *, sm_scale: float, causal: bool, block_q: int, q_len: int, q_offset: int,
    has_segments: bool, q_padded: bool,
):
    need_mask = causal or has_segments or q_padded
    block_k, head_dim = k_ref.shape
    ki = pl.program_id(2)
    # bf16 MXU operands for bf16 inputs, fp32 accumulation — see _fwd_kernel
    mxu = jnp.bfloat16 if k_ref.dtype == jnp.bfloat16 else jnp.float32
    k = k_ref[...].astype(mxu)
    v = v_ref[...].astype(mxu)
    kseg = kseg_ref[...].reshape(1, block_k)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    num_qb = pl.cdiv(q_len, block_q)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[pl.ds(qb * block_q, block_q), :].astype(mxu)
        do = do_ref[pl.ds(qb * block_q, block_q), :].astype(mxu)
        lse = lse_ref[:, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        delta = delta_ref[:, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if need_mask:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            ) + q_offset
            mask = q_pos - q_offset < q_len
            if causal:
                mask = jnp.logical_and(mask, q_pos >= k_pos)
            if has_segments:
                qseg = qseg_ref[:, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
                mask = jnp.logical_and(mask, qseg == kseg)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p.astype(mxu), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * sm_scale).astype(mxu)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    if causal:
        # q blocks strictly before this k block's causal frontier contribute 0.
        min_qpos = ki * block_k - q_offset
        start_qb = jnp.maximum(0, min_qpos // block_q)
    else:
        start_qb = 0
    dk, dv = jax.lax.fori_loop(
        start_qb, num_qb,
        body,
        (
            jnp.zeros((block_k, head_dim), jnp.float32),
            jnp.zeros((block_k, head_dim), jnp.float32),
        ),
    )
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_bwd(res, g, sm_scale, causal, block_q, block_k, has_segments=True):
    q, k, v, q_seg, k_seg, out, lse = res
    do = g
    B, H, Sq, D = q.shape
    Hkv = k.shape[1]
    rep = H // Hkv
    Sk = k.shape[2]
    q_offset = Sk - Sq

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    delta = delta[:, :, None, :]  # [B, H, 1, Sq]

    Sq_p = _round_up(Sq, block_q)
    Sk_p = _round_up(Sk, block_k)
    pad4 = lambda x, S: jnp.pad(x, ((0, 0), (0, 0), (0, S - x.shape[2]), (0, 0)))
    padl = lambda x, S: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, S - x.shape[3])))
    qp, dop = pad4(q, Sq_p), pad4(do, Sq_p)
    kp, vp = pad4(k, Sk_p), pad4(v, Sk_p)
    lsep = padl(lse[:, :, :, :Sq], Sq_p)
    deltap = padl(delta, Sq_p)
    qsegp = _pad_seg(q_seg, Sq_p, -1)
    ksegp = _pad_seg(k_seg, Sk_p, -2)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
        block_k=block_k, kv_len=Sk, q_offset=q_offset,
        has_segments=has_segments, kv_padded=(Sk_p != Sk),
    )
    dq = _pallas_call(
        dq_kernel,
        grid=(B, H, Sq_p // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sk_p, D), lambda b, h, i: (b, h // rep, 0, 0)),
            pl.BlockSpec((None, None, Sk_p, D), lambda b, h, i: (b, h // rep, 0, 0)),
            pl.BlockSpec((None, 1, block_q), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((None, 1, Sk_p), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((None, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, D), lambda b, h, i: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, qsegp, ksegp, dop, lsep, deltap)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
        block_q=block_q, q_len=Sq, q_offset=q_offset,
        has_segments=has_segments, q_padded=(Sq_p != Sq),
    )
    dk, dv = _pallas_call(
        dkv_kernel,
        grid=(B, H, Sk_p // block_k),
        in_specs=[
            pl.BlockSpec((None, None, Sq_p, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, block_k, D), lambda b, h, i: (b, h // rep, i, 0)),
            pl.BlockSpec((None, None, block_k, D), lambda b, h, i: (b, h // rep, i, 0)),
            pl.BlockSpec((None, 1, Sq_p), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, block_k), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((None, None, Sq_p, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, 1, Sq_p), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, 1, Sq_p), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_k, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, block_k, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sk_p, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, qsegp, ksegp, dop, lsep, deltap)

    dk, dv = dk[:, :, :Sk], dv[:, :, :Sk]
    if rep > 1:
        # dk/dv leave the kernel at q-head resolution (each q head's partial
        # against its group's KV head); the group sum is the VJP of GQA's
        # implicit head broadcast — exactly what jnp.repeat's transpose does,
        # minus ever materializing the [B, H, Sk, D] K/V in HBM.
        dk = dk.astype(jnp.float32).reshape(B, Hkv, rep, Sk, D).sum(2)
        dv = dv.astype(jnp.float32).reshape(B, Hkv, rep, Sk, D).sum(2)
        dk, dv = dk.astype(k.dtype), dv.astype(v.dtype)
    return dq[:, :, :Sq], dk, dv, None, None


def _sw(x):
    return jnp.swapaxes(x, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_attention_bshd(q, k, v, q_seg, k_seg, sm_scale, causal, block_q,
                          block_k, has_segments, bwd_block_q, bwd_block_k):
    """custom_vjp boundary in the model's native BSHD layout.

    The PRIMAL (inference — what jax traces when no grad is taken) uses the
    lane-packed forward kernel: zero relayout copies, which were 9.5% of
    the flagship tokenizer forward (profiles/tokenizer_profile.json r5).
    The VJP forward below keeps the BHSD kernels + transposes so training
    numerics and cost are unchanged."""
    if _packed_eligible(q, k, block_k):
        return _flash_fwd_packed(q, k, v, q_seg, k_seg, sm_scale, causal,
                                 block_q, block_k, has_segments)
    out, _ = _flash_fwd(_sw(q), _sw(k), _sw(v), q_seg, k_seg, sm_scale,
                        causal, block_q, block_k, has_segments)
    return _sw(out)


def _flash_attention_bshd_fwd(q, k, v, q_seg, k_seg, sm_scale, causal,
                              block_q, block_k, has_segments,
                              bwd_block_q, bwd_block_k):
    q_t, k_t, v_t = _sw(q), _sw(k), _sw(v)
    out, lse = _flash_fwd(q_t, k_t, v_t, q_seg, k_seg, sm_scale, causal,
                          block_q, block_k, has_segments)
    return _sw(out), (q_t, k_t, v_t, q_seg, k_seg, out, lse)


def _flash_attention_bshd_bwd(sm_scale, causal, block_q, block_k,
                              has_segments, bwd_block_q, bwd_block_k, res, g):
    # the backward kernels hold more live VMEM (dk/dv accumulators + full
    # q/do/lse/delta) than the forward — they get their own, smaller blocks
    dq, dk, dv, _, _ = _flash_bwd(
        res, _sw(g), sm_scale, causal, bwd_block_q, bwd_block_k, has_segments
    )
    return _sw(dq), _sw(dk), _sw(dv), None, None


_flash_attention_bshd.defvjp(_flash_attention_bshd_fwd, _flash_attention_bshd_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def xla_attention(
    q, k, v,
    causal: bool = False,
    segment_ids=None,
    kv_segment_ids=None,
    sm_scale: Optional[float] = None,
):
    """Reference/fallback attention in pure XLA. q,k,v: [B, S, H, D].
    One body with `_xla_attention_lse` so masking fixes apply once."""
    D = q.shape[-1]
    scale = sm_scale if sm_scale is not None else D ** -0.5
    return _xla_attention_lse(
        q, k, v, causal, segment_ids, kv_segment_ids, scale
    )[0]


def attention_with_lse(
    q, k, v,
    causal: bool = False,
    segment_ids=None,
    kv_segment_ids=None,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 3072,
    causal_offset: Optional[int] = None,
    use_pallas: Optional[bool] = None,
):
    """Like `attention` but also returns the log-sum-exp per query row
    [B, H, Sq] (fp32) — the merge statistic for blockwise/ring attention.
    `causal_offset` overrides the default global-position alignment
    (Sk - Sq): query i attends keys j with i + causal_offset >= j."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = sm_scale if sm_scale is not None else D ** -0.5
    if not use_pallas:
        out, lse = _xla_attention_lse(
            q, k, v, causal=causal, segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids, sm_scale=scale,
            causal_offset=causal_offset,
        )
        return out, lse
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    if segment_ids is None:
        q_seg = jnp.zeros((B, 1, Sq), dtype=jnp.int32)
        k_seg = jnp.zeros((B, 1, Sk), dtype=jnp.int32)
        has_segments = False
    else:
        q_seg = segment_ids.astype(jnp.int32)[:, None, :]
        k_seg = (
            kv_segment_ids.astype(jnp.int32)[:, None, :]
            if kv_segment_ids is not None else q_seg
        )
        has_segments = True
    return _pallas_attention_lse(
        q, k, v, q_seg, k_seg, has_segments, causal, scale, block_q,
        block_k, causal_offset,
    )


def _pallas_lse_impl(q, k, v, q_seg, k_seg, has_segments, causal, scale,
                     block_q, block_k, causal_offset):
    Sq = q.shape[1]
    q_t = jnp.swapaxes(q, 1, 2)
    k_t = jnp.swapaxes(k, 1, 2)
    v_t = jnp.swapaxes(v, 1, 2)
    out, lse = _flash_fwd(
        q_t, k_t, v_t, q_seg, k_seg, scale, causal, block_q, block_k,
        has_segments, causal_offset=causal_offset,
    )
    return jnp.swapaxes(out, 1, 2), lse[:, :, 0, :Sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _pallas_attention_lse(q, k, v, q_seg, k_seg, has_segments, causal,
                          scale, block_q, block_k, causal_offset):
    """Differentiable (out, lse) flash attention: Pallas forward, with a
    backward that recomputes through `_xla_attention_lse` (so cotangents of
    BOTH out and lse are handled — blockwise/ring merges differentiate
    through lse). The raw pallas_call has no AD rule; without this wrapper
    ring attention would be untrainable on TPU."""
    return _pallas_lse_impl(q, k, v, q_seg, k_seg, has_segments, causal,
                            scale, block_q, block_k, causal_offset)


def _pallas_lse_fwd(q, k, v, q_seg, k_seg, has_segments, causal, scale,
                    block_q, block_k, causal_offset):
    out = _pallas_lse_impl(q, k, v, q_seg, k_seg, has_segments, causal,
                           scale, block_q, block_k, causal_offset)
    return out, (q, k, v, q_seg, k_seg)


def _pallas_lse_bwd(has_segments, causal, scale, block_q, block_k,
                    causal_offset, res, cts):
    import numpy as _np

    q, k, v, q_seg, k_seg = res
    seg = q_seg[:, 0, :] if has_segments else None
    kv_seg = k_seg[:, 0, :] if has_segments else None

    def f(q, k, v):
        return _xla_attention_lse(
            q, k, v, causal, seg, kv_seg, scale, causal_offset
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(cts)
    zero_seg = _np.zeros(q_seg.shape, jax.dtypes.float0)
    zero_kseg = _np.zeros(k_seg.shape, jax.dtypes.float0)
    return dq, dk, dv, zero_seg, zero_kseg


_pallas_attention_lse.defvjp(_pallas_lse_fwd, _pallas_lse_bwd)


def _xla_attention_lse(q, k, v, causal, segment_ids, kv_segment_ids,
                       sm_scale, causal_offset=None):
    B, Sq, H, D = q.shape
    if k.shape[2] != H:  # GQA: broadcast each KV head over its query group
        k = jnp.repeat(k, H // k.shape[2], axis=2)
        v = jnp.repeat(v, H // v.shape[2], axis=2)
    Sk = k.shape[1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    mask = jnp.ones((B, 1, Sq, Sk), dtype=bool)
    if causal:
        off = causal_offset if causal_offset is not None else Sk - Sq
        q_pos = jnp.arange(Sq)[:, None] + off
        k_pos = jnp.arange(Sk)[None, :]
        mask = jnp.logical_and(mask, (q_pos >= k_pos)[None, None])
    if segment_ids is not None:
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        seg_mask = segment_ids[:, None, :, None] == kv_seg[:, None, None, :]
        mask = jnp.logical_and(mask, seg_mask)
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    lse = jax.nn.logsumexp(logits, axis=-1)  # [B, H, Sq]
    probs = jnp.exp(logits - lse[..., None])
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype), lse


def attention(
    q, k, v,
    causal: bool = False,
    segment_ids=None,
    kv_segment_ids=None,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 3072,
    bwd_block_q: int = 256,
    bwd_block_k: int = 1024,
    use_pallas: Optional[bool] = None,
):
    """Multi-head attention. q: [B,Sq,H,D]; k,v: [B,Sk,Hkv,D] with
    H % Hkv == 0 (Hkv < H = grouped-query attention: pass K/V at their
    native head count — the kernel streams each KV head once per group, so
    GQA's bandwidth saving is real; jnp.repeat to H heads beforehand would
    forfeit it). Returns [B,Sq,H,D].

    `use_pallas=None` auto-selects: Pallas on TPU, XLA elsewhere.

    Inside a `parallel.ring.ring_sequence(mesh)` context (cfg `mesh_seq: N`),
    eligible calls (self-attention, no segment ids, S divisible by the seq
    axis) route through the ring-attention shard_map — context parallelism
    without model changes.
    """
    ring_cfg = getattr(_ring_ambient, "cfg", None)
    if (
        ring_cfg is not None
        and segment_ids is None
        and q.shape[1] == k.shape[1]
        and q.shape[1] % ring_cfg.mesh.shape[ring_cfg.axis] == 0
    ):
        from ..parallel.ring import ring_attention_sharded

        return ring_attention_sharded(
            q, k, v, ring_cfg.mesh, ring_cfg.axis, causal=causal,
            sm_scale=sm_scale, use_pallas=use_pallas,
        )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return xla_attention(
            q, k, v, causal=causal, segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids, sm_scale=sm_scale,
        )

    B, Sq, H, D = q.shape
    assert H % k.shape[2] == 0, (H, k.shape[2])
    Sk = k.shape[1]
    scale = sm_scale if sm_scale is not None else D ** -0.5
    block_q = _pick_block(Sq, block_q)
    block_k = _pick_block(Sk, block_k)
    bwd_block_q = _pick_block(Sq, bwd_block_q)
    bwd_block_k = _pick_block(Sk, bwd_block_k)

    if segment_ids is None:
        q_seg = jnp.zeros((B, 1, Sq), dtype=jnp.int32)
        k_seg = jnp.zeros((B, 1, Sk), dtype=jnp.int32)
    else:
        q_seg = segment_ids.astype(jnp.int32)[:, None, :]
        k_seg = (
            kv_segment_ids.astype(jnp.int32)[:, None, :]
            if kv_segment_ids is not None
            else q_seg
        )

    return _flash_attention_bshd(
        q, k, v, q_seg, k_seg, scale, causal, block_q, block_k,
        segment_ids is not None, bwd_block_q, bwd_block_k,
    )
