"""Single-token KV-cache decode attention for TPU (Pallas), with XLA fallback.

The AR sampling loop (reference ar/generate.py:105-123) is HBM-bandwidth
bound: every decoded token re-reads the KV cache. Design notes, learned the
hard way on a v5e (each alternative was built and profiled):

  * The plain XLA einsum upcasts K/V to fp32 in HBM (~3x the traffic) and
    always reads all S cache slots even though only `pos + 1` are live.
  * A BlockSpec-pipelined kernel hands the cache to the custom call as a
    regular operand, and XLA's memory-space-assignment pass then STAGES THE
    CACHE INTO VMEM before the call (visible as [B/4, ...] slice-start DMAs
    in a device profile), defeating in-kernel block skipping. K/V must be
    `pltpu.ANY` (stay in HBM) with the kernel doing its own DMA.
  * The cache must NOT put S in a tiled dimension: the decode loop writes
    one position per step, and a dynamic_update_slice in the lane dim
    read-modify-writes every tile in that lane's column (~80 us per 94 MB
    cache, x2 x n_layer per token — dominant), and Mosaic DMA cannot slice
    single lanes/sublane-fractions out of tiled HBM anyway.
  * Mosaic DMA slices must be tile-aligned in the last two dims, so the
    per-head layout [B, S, Hkv, D] with D=64 is un-DMA-able. Fusing heads
    into one lane-dense dim — [B, S, Hkv * D] — satisfies alignment (the KV
    width is a multiple of 128 for every real model) and keeps the S row
    update a cheap one-sublane write.

So: cache [B, S, KV] with KV = Hkv * head_dim; K/V in ANY memory space; a
double-buffered `pltpu.make_async_copy` pipeline over S blocks fetching ONLY
the ceil((pos+1)/block_s) live blocks (`pos` arrives via scalar prefetch).
Per-head score/value reductions never reshape the KV dim (that would be a
lane->sublane relayout): the 64-lane head segments are summed with one tiny
MXU matmul against a 0/1 selector matrix built from iota, and probabilities
are broadcast back through its transpose. Scores/softmax are fp32 in VMEM,
matching `ops.attention`'s training kernel.

GQA (n_kv_head < n_head, reference larp_ar.py:190-209): the rep query heads
of each KV group are folded into a leading batch-like dim ([rep, B, KV]
query layout), so every DMA'd K/V block is shared by all rep heads — the
cache traffic (the decode bottleneck) is identical to MHA's, with only
O(rep) extra on-chip VPU work. int8 caches add [S, 128] per-row scale
planes dequantized in-kernel (`_quantize_rows`).

Large batch: VMEM working set scales with B * block_s, so one program over
the full batch either OOMs VMEM or forces tiny S blocks (both measured on a
v5e at B=64). Instead the grid runs over batch CHUNKS of `bc <= 16` rows —
each program DMAs only its own [bc, block_s, KV] cache slices, so block_s
stays large at any batch and VMEM use is constant in B.

Public entry: `decode_attention(q, k_cache, v_cache, pos, key_valid=None)`
with q [B, H, D], caches [B, S, Hkv * D].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import DEFAULT_MASK_VALUE  # single shared mask sentinel
from .attention import _pallas_call  # interpret-mode switch lives there


def _quantize_rows(rows: jax.Array):
    """Symmetric per-(batch, position)-row int8 quantization of K/V rows.

    rows: [B, T, KV] float -> (q8 int8 [B, T, KV], scale fp32 [B, T]) with
    rows ~= q8 * scale[..., None]. One scale per cache row keeps dequant a
    rank-1 broadcast in both the XLA path and the Pallas kernel's [S, 128]
    scale-plane layout (see `init_cache` in models/larp_ar.py)."""
    rows = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(rows), axis=-1)  # [B, T]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q8 = jnp.clip(
        jnp.round(rows / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q8, scale


def _decode_kernel(
    pos_ref,  # scalar prefetch: [1] int32
    q_ref,  # [rep, bc, KV] VMEM (KV == Hkv * D; rep == 1 for MHA). GQA
    #         folds the rep query heads of each KV group into a leading
    #         batch-like dim so every DMA'd K/V block is shared by all rep
    #         heads — zero extra cache traffic vs MHA, only O(rep) extra
    #         VPU/selector work per block. bc = this program's batch chunk.
    k_hbm,  # [B, S, KV] ANY (stays in HBM; this program DMAs its bc rows)
    v_hbm,  # [B, S, KV] ANY
    *rest,  # [bias_hbm] if has_bias, [ks_hbm, vs_hbm] if quantized, then
    #         o_ref and the scratch buffers/semaphores in matching order.
    #         bias_hbm: [S, 128] fp32 ANY (0 valid / -inf-ish invalid; batch
    #         in the first B lanes, lane dim padded to the 128 tile). When
    #         key_valid is None (the dominant class-conditional serving
    #         path) the operand is omitted entirely — no all-zeros plane
    #         DMA'd, positional masking alone suffices.
    sm_scale: float,
    block_s: int,
    head_dim: int,
    rep: int,
    bc: int,
    quantized: bool,
    has_bias: bool,
):
    # int8 caches add two [S, 128] fp32 scale-plane operands (same layout as
    # the bias plane: S in the sublane dim, batch in the first B lanes) plus
    # their double-buffered scratch/semaphores.
    rest = list(rest)
    bias_hbm = rest.pop(0) if has_bias else None
    if quantized:
        ks_hbm, vs_hbm = rest.pop(0), rest.pop(0)
    else:
        ks_hbm = vs_hbm = None
    o_ref, k_buf, v_buf = rest.pop(0), rest.pop(0), rest.pop(0)
    b_buf = rest.pop(0) if has_bias else None
    if quantized:
        ks_buf, vs_buf = rest.pop(0), rest.pop(0)
    else:
        ks_buf = vs_buf = None
    k_sem, v_sem = rest.pop(0), rest.pop(0)
    b_sem = rest.pop(0) if has_bias else None
    if quantized:
        ks_sem, vs_sem = rest.pop(0), rest.pop(0)
    else:
        ks_sem = vs_sem = None
    assert not rest, len(rest)
    pos = pos_ref[0]
    nb = pos // block_s + 1  # live blocks (dynamic)
    off = pl.program_id(0) * bc  # this program's batch rows [off, off + bc)
    b_slice = pl.ds(off, bc)
    # 0/1 lane picker for this chunk's columns of the [S, 128] bias/scale
    # planes: pick[l, i] = 1 iff lane l is batch row off + i. A dynamic
    # lane-slice is not lowerable on TPU; one tiny MXU matmul against this
    # picker extracts the bc live lanes instead.
    pick = (
        jax.lax.broadcasted_iota(jnp.int32, (128, bc), 0)
        == off + jax.lax.broadcasted_iota(jnp.int32, (128, bc), 1)
    ).astype(jnp.float32)

    def pick_lanes(plane):  # [block_s, 128] -> [bc, block_s]
        return jnp.swapaxes(
            jax.lax.dot_general(
                plane, pick, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            0, 1,
        )

    def kv_copy(j, slot):
        s_slice = pl.ds(j * block_s, block_s)
        copies = [
            pltpu.make_async_copy(
                k_hbm.at[b_slice, s_slice], k_buf.at[slot], k_sem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[b_slice, s_slice], v_buf.at[slot], v_sem.at[slot]
            ),
        ]
        if has_bias:
            copies.append(pltpu.make_async_copy(
                bias_hbm.at[s_slice], b_buf.at[slot], b_sem.at[slot]
            ))
        if quantized:
            copies += [
                pltpu.make_async_copy(
                    ks_hbm.at[s_slice], ks_buf.at[slot], ks_sem.at[slot]
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[s_slice], vs_buf.at[slot], vs_sem.at[slot]
                ),
            ]
        return copies

    for c in kv_copy(0, 0):
        c.start()

    KV = k_buf.shape[-1]
    H = KV // head_dim  # KV heads (== query heads when rep == 1)
    q = q_ref[...].astype(jnp.float32)  # [rep, bc, KV]
    # 0/1 head selector: sel[c, h] = 1 iff lane c belongs to head h. One
    # small MXU matmul sums each head's lane segment — reshaping the KV lane
    # dim into (H, D) would be a lane->sublane relayout instead.
    lane = jax.lax.broadcasted_iota(jnp.int32, (KV, H), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (KV, H), 1)
    sel = (lane // head_dim == head).astype(jnp.float32)  # [KV, H]

    def body(j, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nb)
        def _prefetch():
            for c in kv_copy(j + 1, 1 - slot):
                c.start()

        for c in kv_copy(j, slot):
            c.wait()
        k = k_buf[slot].astype(jnp.float32)  # [bc, block_s, KV]
        v = v_buf[slot].astype(jnp.float32)
        if quantized:
            ks = pick_lanes(ks_buf[slot])[:, :, None]
            vs = pick_lanes(vs_buf[slot])[:, :, None]
            k = k * ks  # [bc, block_s, KV] dequant per cache row
            v = v * vs

        qk = q[:, :, None, :] * k[None]  # [rep, bc, block_s, KV]
        s = jax.lax.dot_general(
            qk.reshape(rep * bc * block_s, KV), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rep, bc, block_s, H) * sm_scale

        k_pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_s, 1), 2
        )
        if has_bias:
            s = s + pick_lanes(b_buf[slot])[None, :, :, None]
        s = jnp.where(k_pos <= pos, s, DEFAULT_MASK_VALUE)

        # online softmax over the block_s dim
        m_cur = jnp.max(s, axis=2, keepdims=True)  # [rep, bc, 1, H]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rep, bc, block_s, H]
        l_new = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)

        # broadcast p back across each head's lanes, weight V, reduce the
        # block_s dim -> [rep, bc, KV]
        pb = jax.lax.dot_general(
            p.reshape(rep * bc * block_s, H), sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rep, bc, block_s, KV)
        pv = jnp.sum(pb * v[None], axis=2)
        alpha_full = jax.lax.dot_general(
            alpha[:, :, 0].reshape(rep * bc, H), sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(rep, bc, KV)
        return m_new, l_new, acc * alpha_full + pv

    m0 = jnp.full((rep, bc, 1, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rep, bc, 1, H), jnp.float32)
    acc0 = jnp.zeros((rep, bc, KV), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    l_full = jax.lax.dot_general(
        l[:, :, 0].reshape(rep * bc, H), sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(rep, bc, KV)
    o_ref[...] = (acc / l_full).astype(o_ref.dtype)


def _pallas_decode(q, k_cache, v_cache, pos, key_valid, sm_scale, block_s,
                   head_dim, bc, k_scale=None, v_scale=None, kv_heads=None):
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    rep = H // Hkv  # query heads per KV head (1 for MHA)
    quantized = k_scale is not None
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    # GQA: query head h reads KV group h // rep (matching the training
    # path's jnp.repeat). Lay q out [rep, B, Hkv * D] so each r-slice aligns
    # with the [bc, ...] K/V blocks in the kernel; the grid blocks the B dim
    # into chunks of bc rows. Caches may carry zero PAD LANES past Hkv * D
    # (128-alignment, larp_ar.init_cache): q gets the same zero pad, the
    # kernel treats the pad as extra (garbage) heads, and the output slice
    # below drops them.
    q_in = q.reshape(B, Hkv, rep, D).transpose(2, 0, 1, 3).reshape(
        rep, B, Hkv * D
    )
    if KV > Hkv * D:
        q_in = jnp.pad(q_in, ((0, 0), (0, 0), (0, KV - Hkv * D)))
    # key validity as an additive bias laid out [S, 128] (batch in the first
    # B lanes): S in the SUBLANE dim so per-block DMA slices are
    # tile-aligned, and the lane dim padded to the 128 tile (lane slices of
    # tiled HBM cannot be sub-128). When key_valid is None the operand is
    # omitted: positional masking alone is correct and the all-zeros plane's
    # DMA stream disappears from the bandwidth-bound loop.
    has_bias = key_valid is not None
    if has_bias:
        bias = jnp.pad(
            jnp.where(key_valid, 0.0, DEFAULT_MASK_VALUE).T,
            ((0, 0), (0, 128 - B)),
        )

    n_hbm = 2 + int(has_bias) + (2 if quantized else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bc,),
        in_specs=[pl.BlockSpec((rep, bc, KV), lambda i, pos_ref: (0, i, 0))]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_hbm,
        out_specs=pl.BlockSpec((rep, bc, KV), lambda i, pos_ref: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bc, block_s, KV), k_cache.dtype),
            pltpu.VMEM((2, bc, block_s, KV), v_cache.dtype),
        ]
        + ([pltpu.VMEM((2, block_s, 128), jnp.float32)] if has_bias else [])
        + ([pltpu.VMEM((2, block_s, 128), jnp.float32)] * 2 if quantized
           else [])
        + [pltpu.SemaphoreType.DMA((2,))] * (n_hbm),
    )
    kernel = functools.partial(
        _decode_kernel, sm_scale=sm_scale, block_s=block_s,
        head_dim=head_dim, rep=rep, bc=bc, quantized=quantized,
        has_bias=has_bias,
    )
    operands = [pos, q_in, k_cache, v_cache]
    if has_bias:
        operands.append(bias)
    if quantized:
        operands += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    # GQA rep>1 working sets run slightly past the 16 MB default (16.21 MB
    # measured at rep=4/bc=16/KV=384 on a v5e) — but ONLY raise the scoped
    # limit when needed: a blanket 64 MB hint changes Mosaic's scheduling
    # for the MHA kernel too and measured as part of a ~8% decode
    # regression r2 -> r3 (A/B 2026-08-21)
    cp = (pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=64 * (1 << 20))
          if rep > 1 else
          pltpu.CompilerParams(dimension_semantics=("arbitrary",)))
    out = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rep, B, KV), q.dtype),
        compiler_params=cp,
    )(*operands)
    # [rep, B, Hkv, D] -> [B, H, D] with h = g * rep + r
    return (
        out[:, :, : Hkv * D]
        .reshape(rep, B, Hkv, D).transpose(1, 2, 0, 3).reshape(B, H, D)
    )


def _chunk_kernel(
    pos_ref,  # scalar prefetch: [B] int32 per-row position of chunk token 0
    q_ref,  # [bc, GHp, KV] VMEM — block-diagonal EXPANDED queries: row
    #         g * H + h holds query (g, h) in the lanes of KV segment
    #         h // rep, zero elsewhere (built in XLA by `_expand_queries`);
    #         GHp = G * H rounded up to the sublane tile
    pos2d_ref,  # [bc, 128] int32 VMEM — pos broadcast along lanes (the mask
    #             needs pos as a VECTOR per sublane-row; scalar-prefetch
    #             values can't be assembled into one on TPU)
    k_hbm,  # [B, S, KV] ANY
    v_hbm,  # [B, S, KV] ANY
    *rest,  # [bias_hbm], [ks_hbm, vs_hbm], o_ref, scratch (as _decode_kernel)
    sm_scale: float,
    block_s: int,
    head_dim: int,
    rep: int,
    bc: int,
    G: int,
    n_head: int,
    quantized: bool,
    has_bias: bool,
):
    """G-token verification attention (speculative decoding) with the same
    live-prefix DMA pipeline as `_decode_kernel`: only ceil((max_pos + G) /
    block_s) cache blocks are fetched, vs the XLA path's full padded cache.
    Query g of batch row b attends to cache slots <= pos[b] + g.

    Round-4 rewrite: the round-3 kernel unrolled a per-g loop whose body
    broadcast-multiplied the FULL [bc, block_s, KV] K and V blocks on the
    VPU (~4 full-width passes per g per block) — measured 1.42 ms per extra
    chunk position on the 632M/30-layer verify (chunk[5] 9.37 ms vs plain
    step 2.75 ms, tools/profile_chunk_r4.py), which made speculative lose to
    the loop it must amortize. Now ALL G x H (query, head) pairs are one
    batched MXU matmul per block against block-diagonally expanded queries:

        s[b, g*H + h, t] = dot(qexp[b, g*H + h, :], k[b, t, :])

    — exact because qexp row (g, h) is zero outside its own head's lane
    segment. Scores/probs live [bc, GHp, block_s] (lane-dim softmax), the
    value side is a second batched matmul p @ v -> [bc, GHp, KV], and the
    per-head output extraction is one masked sublane reduction at the end.
    The int8 cache scales fold into the [.., block_s]-thin score/prob
    planes instead of the full-width K/V blocks. MXU work is H x the
    algebraic attention FLOPs (each row contracts the full fused-KV width
    for one head's worth of signal) — a deliberate trade: ~10 us of MXU
    per block replaces ~200 us of VPU, and the loop stays DMA-bound."""
    rest = list(rest)
    bias_hbm = rest.pop(0) if has_bias else None
    if quantized:
        ks_hbm, vs_hbm = rest.pop(0), rest.pop(0)
    else:
        ks_hbm = vs_hbm = None
    o_ref, k_buf, v_buf = rest.pop(0), rest.pop(0), rest.pop(0)
    b_buf = rest.pop(0) if has_bias else None
    if quantized:
        ks_buf, vs_buf = rest.pop(0), rest.pop(0)
    else:
        ks_buf = vs_buf = None
    k_sem, v_sem = rest.pop(0), rest.pop(0)
    b_sem = rest.pop(0) if has_bias else None
    if quantized:
        ks_sem, vs_sem = rest.pop(0), rest.pop(0)
    else:
        ks_sem = vs_sem = None
    assert not rest, len(rest)

    off = pl.program_id(0) * bc
    b_slice = pl.ds(off, bc)
    # this program's live blocks: the largest key any of its rows/queries
    # may attend to is max(pos) + G - 1
    pmax = pos_ref[off]
    for i in range(1, bc):
        pmax = jnp.maximum(pmax, pos_ref[off + i])
    nb = (pmax + G - 1) // block_s + 1
    pvec = pos2d_ref[:, :1]  # [bc, 1] per-row chunk base position

    pick = (
        jax.lax.broadcasted_iota(jnp.int32, (128, bc), 0)
        == off + jax.lax.broadcasted_iota(jnp.int32, (128, bc), 1)
    ).astype(jnp.float32)

    def pick_lanes(plane):  # [block_s, 128] -> [bc, block_s]
        return jnp.swapaxes(
            jax.lax.dot_general(
                plane, pick, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            0, 1,
        )

    def kv_copy(j, slot):
        s_slice = pl.ds(j * block_s, block_s)
        copies = [
            pltpu.make_async_copy(
                k_hbm.at[b_slice, s_slice], k_buf.at[slot], k_sem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[b_slice, s_slice], v_buf.at[slot], v_sem.at[slot]
            ),
        ]
        if has_bias:
            copies.append(pltpu.make_async_copy(
                bias_hbm.at[s_slice], b_buf.at[slot], b_sem.at[slot]
            ))
        if quantized:
            copies += [
                pltpu.make_async_copy(
                    ks_hbm.at[s_slice], ks_buf.at[slot], ks_sem.at[slot]
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[s_slice], vs_buf.at[slot], vs_sem.at[slot]
                ),
            ]
        return copies

    for c in kv_copy(0, 0):
        c.start()

    KV = k_buf.shape[-1]  # may include pad lanes past the real Hkv * D
    H = n_head  # query (g, h) rows per g group (REAL heads — KV // head_dim
    #             would count the 128-alignment pad lanes as extra heads)
    GHp = q_ref.shape[1]
    qexp = q_ref[...].astype(jnp.bfloat16)  # [bc, GHp, KV]

    # row r = g * H + h; per-row causal limit pos[b] + g with g = r // H
    g_row = jax.lax.broadcasted_iota(jnp.int32, (1, GHp, 1), 1) // H
    limit = pvec[:, :, None] + g_row  # [bc, GHp, 1]

    def body(j, carry):
        m_prev, l_prev, acc = carry  # [bc, GHp, 1] x2, [bc, GHp, KV] fp32
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nb)
        def _prefetch():
            for c in kv_copy(j + 1, 1 - slot):
                c.start()

        for c in kv_copy(j, slot):
            c.wait()
        k = k_buf[slot].astype(jnp.bfloat16)  # [bc, block_s, KV]
        v = v_buf[slot].astype(jnp.bfloat16)

        # one batched MXU matmul scores every (g, h) row at once
        s = jax.lax.dot_general(
            qexp, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [bc, GHp, block_s]
        if quantized:
            # per-cache-row int8 scales fold into the block_s-thin score
            # plane (not the full-width K block): s_raw * ks[b, t]
            s = s * pick_lanes(ks_buf[slot])[:, None, :]
        if has_bias:
            s = s + pick_lanes(b_buf[slot])[:, None, :]
        k_pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_s), 2
        )
        s = jnp.where(k_pos <= limit, s, DEFAULT_MASK_VALUE)

        # online softmax over the block_s LANE dim
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [bc, GHp, block_s] fp32
        l_new = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)
        if quantized:
            p = p * pick_lanes(vs_buf[slot])[:, None, :]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bc, GHp, KV]
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((bc, GHp, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bc, GHp, 1), jnp.float32)
    acc0 = jnp.zeros((bc, GHp, KV), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    acc = acc / l  # [bc, GHp, KV]

    # per-head extraction: row g*H + h owns the lanes of KV segment
    # h // rep; output r-slice wants h = (l // D) * rep + r. One masked
    # sublane reduction per rep (once per program, not per block).
    acc4 = acc[:, : G * H, :].reshape(bc, G, H, KV)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H, KV), 2)
    seg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H, KV), 3) // head_dim
    outs = []
    for r in range(rep):
        mask_r = (h_iota == seg * rep + r).astype(jnp.float32)
        outs.append(jnp.sum(acc4 * mask_r, axis=2))  # [bc, G, KV]
    o = jnp.stack(outs, axis=0)  # [rep, bc, G, KV]
    o_ref[...] = o.astype(o_ref.dtype)


def _expand_queries(q, rep, Hkv, D, KV, GHp):
    """[B, G, H, D] -> block-diagonal [B, GHp, KV] (see `_chunk_kernel`):
    row g * H + h carries query (g, h) in the lanes of KV segment h // rep,
    zero elsewhere; rows past G * H and lanes past Hkv * D are zero pad."""
    B, G, H, _ = q.shape
    qt = jnp.tile(q, (1, 1, 1, Hkv))  # [B, G, H, Hkv * D]
    seg = jnp.arange(Hkv * D) // D
    h = jnp.arange(H)[:, None]
    qe = jnp.where(
        (seg[None, :] == h // rep)[None, None], qt, 0
    ).reshape(B, G * H, Hkv * D)
    return jnp.pad(
        qe, ((0, 0), (0, GHp - G * H), (0, KV - Hkv * D))
    )


def _pallas_chunk(q, k_cache, v_cache, pos, key_valid, sm_scale, block_s,
                  head_dim, bc, k_scale=None, v_scale=None, kv_heads=None):
    B, G, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    rep = H // Hkv
    quantized = k_scale is not None
    pos = jnp.asarray(pos, jnp.int32).reshape(B)
    GHp = _round_up16(G * H)
    q_in = _expand_queries(q.astype(jnp.bfloat16), rep, Hkv, D, KV, GHp)
    pos2d = jnp.broadcast_to(pos[:, None], (B, 128))
    has_bias = key_valid is not None
    if has_bias:
        bias = jnp.pad(
            jnp.where(key_valid, 0.0, DEFAULT_MASK_VALUE).T,
            ((0, 0), (0, 128 - B)),
        )

    n_hbm = 2 + int(has_bias) + (2 if quantized else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, GHp, KV), lambda i, pos_ref: (i, 0, 0)),
            pl.BlockSpec((bc, 128), lambda i, pos_ref: (i, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_hbm,
        out_specs=pl.BlockSpec(
            (rep, bc, G, KV), lambda i, pos_ref: (0, i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bc, block_s, KV), k_cache.dtype),
            pltpu.VMEM((2, bc, block_s, KV), v_cache.dtype),
        ]
        + ([pltpu.VMEM((2, block_s, 128), jnp.float32)] if has_bias else [])
        + ([pltpu.VMEM((2, block_s, 128), jnp.float32)] * 2 if quantized
           else [])
        + [pltpu.SemaphoreType.DMA((2,))] * (n_hbm),
    )
    kernel = functools.partial(
        _chunk_kernel, sm_scale=sm_scale, block_s=block_s,
        head_dim=head_dim, rep=rep, bc=bc, G=G, n_head=H,
        quantized=quantized, has_bias=has_bias,
    )
    operands = [pos, q_in, pos2d, k_cache, v_cache]
    if has_bias:
        operands.append(bias)
    if quantized:
        operands += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    out = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rep, B, G, KV), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # bf16 temps put the big-block working set ~40 MB at the bench
            # geometry; the 16 MB default scoped limit is for pipelining
            # many small kernels, which this latency-bound loop is not
            vmem_limit_bytes=100 * (1 << 20),
        ),
    )(*operands)
    # [rep, B, G, Hkv, D] -> [B, G, H, D] with h = grp * rep + r
    return (
        out[..., : Hkv * D]
        .reshape(rep, B, G, Hkv, D)
        .transpose(1, 2, 3, 0, 4)
        .reshape(B, G, H, D)
    )


_warned_chunk_fallback = False


def chunk_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    block_s: Optional[int] = None,
    batch_chunk: Optional[int] = None,
    kv_heads: Optional[int] = None,
) -> jax.Array:
    """G-token decode attention over a KV cache with PER-ROW positions (the
    speculative-decoding verification forward). Same contract as
    `xla_chunk_attention` (q: [B, G, H, D], pos: [B]); dispatches to the
    live-prefix Pallas kernel on TPU and the XLA einsum elsewhere."""
    if use_pallas is None:
        from .attention import _INTERPRET

        use_pallas = jax.default_backend() == "tpu" or _INTERPRET
    B, G, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    bc = batch_chunk or _pick_batch_chunk(B)
    if block_s is None:
        # the loop is DMA-LATENCY bound (measured: ~27 us/block regardless
        # of block_s), so prefer few, large blocks under an explicit
        # working-set budget: raw double-buffered K/V + their bf16 copies
        # scale with block_s; the fp32 acc and the expanded queries are
        # fixed. ~80 MB of the 128 MB VMEM (the kernel raises its own
        # vmem_limit_bytes past the 16 MB scoped default).
        GHp = _round_up16(G * H)
        cache_b = jnp.dtype(k_cache.dtype).itemsize
        unit = (2 * 2 * bc * KV * cache_b  # double-buffered raw K+V
                + 2 * bc * KV * 2  # bf16 dequant copies of current block
                + 2 * bc * GHp * 4)  # fp32 scores + probs
        fixed = bc * GHp * KV * (4 + 2)  # fp32 acc + bf16 qexp
        budget = 80 * (1 << 20)
        block_s = 0
        for bs_c in (512, 384, 288, 256, 192, 128, 64, 32, 16, 8):
            if S % bs_c == 0 and fixed + unit * bs_c <= budget:
                block_s = bs_c
                break
        if block_s == 0 and use_pallas:
            # a silent XLA fallback once masked a perf bug for a whole
            # round (see the round-2 incident in the tests' docstrings and
            # quant_matmul's _warned_fallback) — say it once
            global _warned_chunk_fallback
            if not _warned_chunk_fallback:
                import warnings

                warnings.warn(
                    f"chunk_attention: no block_s candidate fits the VMEM "
                    f"budget at S={S} B={B} G={G} KV={KV} — falling back "
                    "to the full-cache XLA path (slow at long S)",
                    stacklevel=2,
                )
                _warned_chunk_fallback = True
    elif S % block_s != 0:
        raise ValueError(f"block_s={block_s} does not divide S={S}")
    if (not use_pallas or H % Hkv != 0 or KV < Hkv * D or KV % 128 != 0
            or block_s == 0
            or bc == 0 or bc % 8 != 0 or B % bc != 0 or B > 128):
        return xla_chunk_attention(
            q, k_cache, v_cache, pos, key_valid, sm_scale, k_scale, v_scale,
            kv_heads=kv_heads,
        )
    scale = sm_scale if sm_scale is not None else D ** -0.5
    return _pallas_chunk(
        q, k_cache, v_cache, pos, key_valid, scale, block_s, D, bc,
        k_scale, v_scale, kv_heads=Hkv,
    )


def xla_decode_attention(q, k_cache, v_cache, pos, key_valid=None,
                         sm_scale=None, k_scale=None, v_scale=None,
                         kv_heads=None):
    """Reference/fallback path in pure XLA. q: [B, H, D];
    k_cache/v_cache: [B, S, >= Hkv * D] (extra lanes are 128-alignment
    padding, sliced off); pos: scalar (last live key, inclusive);
    k_scale/v_scale: optional [S, 128] fp32 dequant planes for int8 caches
    (batch in the first B lanes, one scale per cache row)."""
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    if KV > Hkv * D:
        k_cache = k_cache[..., : Hkv * D]
        v_cache = v_cache[..., : Hkv * D]
    rep = H // Hkv
    scale = sm_scale if sm_scale is not None else D ** -0.5
    qg = q.reshape(B, Hkv, rep, D).astype(jnp.float32)
    kh = k_cache.reshape(B, S, Hkv, D)
    vh = v_cache.reshape(B, S, Hkv, D)
    if k_scale is not None:
        # int8 caches: keep the dots in a narrow dtype (int8 -> bf16 is
        # exact, and the convert fuses into the dot) and fold the per-row
        # scales into scores/probs — dequantizing the whole [B, S, KV]
        # cache to fp32 in HBM quadruples the bandwidth-bound traffic and
        # dominated the step at large batch (~94 ms/step at B=64, v5e).
        kh = kh.astype(jnp.bfloat16)
        vh = vh.astype(jnp.bfloat16)
    else:
        kh = kh.astype(jnp.float32)
        vh = vh.astype(jnp.float32)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg, kh, preferred_element_type=jnp.float32
    ) * scale
    if k_scale is not None:
        scores = scores * k_scale[:, :B].T[:, None, None, :]
    valid = jnp.arange(S)[None, None, None, :] <= pos
    if key_valid is not None:
        valid = jnp.logical_and(valid, key_valid[:, None, None, :])
    # finite sentinel (same as the Pallas kernel): an all-masked row then
    # degrades to uniform-garbage like the kernel instead of NaN — the two
    # dispatch targets of the public op must agree
    scores = jnp.where(valid, scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :B].T[:, None, None, :]
    out = jnp.einsum(
        "bhgs,bshd->bhgd", probs, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(B, H, D).astype(q.dtype)


def xla_chunk_attention(q, k_cache, v_cache, pos, key_valid=None,
                        sm_scale=None, k_scale=None, v_scale=None,
                        kv_heads=None):
    """G-token causal decode attention over a KV cache (the speculative-
    decoding verification forward; generation/speculative.py). q: [B, G, H, D]
    — G chunk tokens per row, the g-th at absolute position pos[b] + g;
    k_cache/v_cache: [B, S, Hkv * D] with the chunk's rows already written;
    pos: [B] int32 per-row position of chunk token 0 (rows advance unevenly
    under speculative acceptance); key_valid: optional [B, S] bool;
    k_scale/v_scale: optional [S, 128] fp32 dequant planes for int8 caches.
    Query g attends to cache slots <= pos[b] + g (causal within the chunk,
    full prefix before it). Returns [B, G, H, D] in q.dtype.

    XLA path only: the chunk reads the whole padded cache once per layer —
    already amortized over the G tokens it verifies, so the Pallas live-
    prefix DMA machinery buys far less here than in the 1-token loop."""
    B, G, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    if KV > Hkv * D:
        k_cache = k_cache[..., : Hkv * D]
        v_cache = v_cache[..., : Hkv * D]
    rep = H // Hkv
    scale = sm_scale if sm_scale is not None else D ** -0.5
    qg = q.reshape(B, G, Hkv, rep, D).astype(jnp.float32)
    kh = k_cache.reshape(B, S, Hkv, D)
    vh = v_cache.reshape(B, S, Hkv, D)
    if k_scale is not None:
        kh = kh.astype(jnp.bfloat16)  # int8 -> bf16 exact; fuses into the dot
        vh = vh.astype(jnp.bfloat16)
    else:
        kh = kh.astype(jnp.float32)
        vh = vh.astype(jnp.float32)
    scores = jnp.einsum(
        "bghrd,bshd->bhrgs", qg, kh, preferred_element_type=jnp.float32
    ) * scale
    if k_scale is not None:
        scores = scores * k_scale[:, :B].T[:, None, None, None, :]
    q_pos = pos[:, None] + jnp.arange(G)[None, :]  # [B, G]
    valid = (
        jnp.arange(S)[None, None, :] <= q_pos[:, :, None]
    )[:, None, None, :, :]  # [B, 1, 1, G, S]
    if key_valid is not None:
        valid = jnp.logical_and(valid, key_valid[:, None, None, None, :])
    scores = jnp.where(valid, scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :B].T[:, None, None, None, :]
    out = jnp.einsum(
        "bhrgs,bshd->bghrd", probs, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(B, G, H, D).astype(q.dtype)


def _round_up16(v: int) -> int:
    return max(16, ((v + 15) // 16) * 16)


def _pick_block_s(S: int, vmem_budget_bytes: int, row_bytes: int) -> int:
    """Largest block_s in {256, ..., 8} dividing S whose per-block fp32
    compute working set fits the budget. row_bytes = bc * KV * 4: the kernel
    body's fp32 temporaries (the dequantized/upcast K and V blocks and the
    qk product) are what OOM VMEM, NOT the raw cache-dtype DMA buffers —
    sized by cache bytes, int8 at bc=16/block_s=128 looks half the size of
    bf16 but fails to compile (v5e, Mosaic scoped-vmem) because its fp32
    dequant temps are identical. 5.5 MB was swept on a v5e
    (tools/sweep_decode_tiles.py): bc=16 -> block_s 64, bc=8 -> 128 compile
    for both cache dtypes and are the fastest measured configs."""
    for bs in (256, 128, 64, 32, 16, 8):
        if S % bs == 0 and bs * row_bytes <= vmem_budget_bytes:
            return bs
    return 0


def _pick_batch_chunk(B: int, limit: int = 16) -> int:
    """Largest multiple-of-8 divisor of B that is <= limit (the per-program
    batch rows). 16 rows x block_s 128 is the empirically VMEM-safe working
    set on v5e; larger per-program batches stack-OOM in fp32 compute
    temporaries, and non-multiple-of-8 chunks violate the sublane tiling of
    the q/o block shapes. Returns 0 (-> XLA fallback) when B has no such
    divisor."""
    if B <= limit:
        return B if B % 8 == 0 else 0
    for d in range(limit - limit % 8, 0, -8):
        if B % d == 0:
            return d
    return 0


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    block_s: Optional[int] = None,
    batch_chunk: Optional[int] = None,
    kv_heads: Optional[int] = None,
) -> jax.Array:
    """One-token decode attention over a KV cache.

    q: [B, H, D] (current token); k_cache/v_cache: [B, S, Hkv * D] (heads
    fused into one lane-dense dim); pos: scalar int32 absolute position of
    the current token (its K/V must already be written to the cache);
    key_valid: optional [B, S] bool marking cache slots usable as keys (the
    emb_masks path); k_scale/v_scale: optional [S, 128] fp32 per-row dequant
    planes for int8 caches (see `_quantize_rows`). Returns [B, H, D] in
    q.dtype. `use_pallas=None` auto-selects; the Pallas path covers MHA and
    GQA with a 128-multiple KV-cache width — tiny test geometries use the
    XLA path. `block_s`/`batch_chunk` override the auto-tuned kernel tile
    sizes (tools/profile_decode.py sweeps them).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = kv_heads or (KV // D)
    bc = batch_chunk or _pick_batch_chunk(B)
    if batch_chunk is not None and (bc % 8 != 0 or B % bc != 0):
        # an explicit override must not silently fall back to XLA — that
        # would label fallback timings as Pallas configs in tile sweeps
        raise ValueError(
            f"batch_chunk={batch_chunk} invalid for B={B}: needs "
            "batch_chunk % 8 == 0 and B % batch_chunk == 0"
        )
    if block_s is None:
        # rep scales the kernel's fp32 qk/pb temporaries (GQA folds rep
        # query heads per KV block), so it scales the budget denominator
        rep_ = max(H // Hkv, 1)
        block_s = _pick_block_s(S, int(5.5 * (1 << 20)), bc * KV * 4 * rep_)
    elif S % block_s != 0:
        # an explicit override must tile S exactly: a clamped final-block
        # DMA would read misaligned cache rows under wrong position labels
        raise ValueError(f"block_s={block_s} does not divide S={S}")
    if (not use_pallas or H % Hkv != 0 or KV < Hkv * D or KV % 128 != 0
            or block_s == 0
            or bc == 0 or bc % 8 != 0 or B % bc != 0 or B > 128):
        return xla_decode_attention(
            q, k_cache, v_cache, pos, key_valid, sm_scale, k_scale, v_scale,
            kv_heads=kv_heads,
        )
    scale = sm_scale if sm_scale is not None else D ** -0.5
    return _pallas_decode(
        q, k_cache, v_cache, pos, key_valid, scale, block_s, D, bc,
        k_scale, v_scale, kv_heads=Hkv,
    )
