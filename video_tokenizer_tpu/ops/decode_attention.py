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
matching `ops.attention`'s training kernel. MHA only (rep == 1 — every
llama-abs zoo entry); GQA uses the XLA fallback.

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

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    pos_ref,  # scalar prefetch: [1] int32
    q_ref,  # [B, KV] VMEM (KV == H * D for MHA)
    k_hbm,  # [B, S, KV] ANY (stays in HBM)
    v_hbm,  # [B, S, KV] ANY
    bias_hbm,  # [S, 128] fp32 ANY (0 valid / -inf-ish invalid; batch in
    #            the first B lanes, lane dim padded to the 128 tile)
    o_ref,  # [B, KV] VMEM
    k_buf,  # scratch [2, B, block_s, KV]
    v_buf,  # scratch [2, B, block_s, KV]
    b_buf,  # scratch [2, block_s, 128]
    k_sem,  # DMA semaphores (2,)
    v_sem,
    b_sem,
    *,
    sm_scale: float,
    block_s: int,
    head_dim: int,
):
    pos = pos_ref[0]
    nb = pos // block_s + 1  # live blocks (dynamic)

    def kv_copy(j, slot):
        s_slice = pl.ds(j * block_s, block_s)
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, s_slice], k_buf.at[slot], k_sem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, s_slice], v_buf.at[slot], v_sem.at[slot]
            ),
            pltpu.make_async_copy(
                bias_hbm.at[s_slice], b_buf.at[slot], b_sem.at[slot]
            ),
        )

    for c in kv_copy(0, 0):
        c.start()

    _, B, _, KV = k_buf.shape
    H = KV // head_dim
    q = q_ref[...].astype(jnp.float32)  # [B, KV]
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
        k = k_buf[slot].astype(jnp.float32)  # [B, block_s, KV]
        v = v_buf[slot].astype(jnp.float32)

        qk = q[:, None, :] * k  # [B, block_s, KV]
        s = jax.lax.dot_general(
            qk.reshape(B * block_s, KV), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, block_s, H) * sm_scale

        k_pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_s, 1), 1
        )
        bias = jnp.swapaxes(b_buf[slot][:, :B], 0, 1)[:, :, None]  # [B,bs,1]
        s = jnp.where(k_pos <= pos, s + bias, DEFAULT_MASK_VALUE)

        # online softmax over the block_s dim
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [B, 1, H]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [B, block_s, H]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        # broadcast p back across each head's lanes, weight V, reduce the
        # block_s dim -> [B, KV]
        pb = jax.lax.dot_general(
            p.reshape(B * block_s, H), sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, block_s, KV)
        pv = jnp.sum(pb * v, axis=1)
        alpha_full = jax.lax.dot_general(
            alpha[:, 0], sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, KV]
        return m_new, l_new, acc * alpha_full + pv

    m0 = jnp.full((B, 1, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, 1, H), jnp.float32)
    acc0 = jnp.zeros((B, KV), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    l_full = jax.lax.dot_general(
        l[:, 0], sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc / l_full).astype(o_ref.dtype)


def _pallas_decode(q, k_cache, v_cache, pos, key_valid, sm_scale, block_s,
                   head_dim):
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    # key validity as an additive bias laid out [S, 128] (batch in the first
    # B lanes): S in the SUBLANE dim so per-block DMA slices are
    # tile-aligned, and the lane dim padded to the 128 tile (lane slices of
    # tiled HBM cannot be sub-128)
    if key_valid is None:
        bias = jnp.zeros((S, 128), jnp.float32)
    else:
        bias = jnp.pad(
            jnp.where(key_valid, 0.0, DEFAULT_MASK_VALUE).T,
            ((0, 0), (0, 128 - B)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, KV), lambda i, pos_ref: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((B, KV), lambda i, pos_ref: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, block_s, KV), k_cache.dtype),
            pltpu.VMEM((2, B, block_s, KV), v_cache.dtype),
            pltpu.VMEM((2, block_s, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, sm_scale=sm_scale, block_s=block_s, head_dim=head_dim
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(pos, q.reshape(B, KV), k_cache, v_cache, bias)
    return out.reshape(B, H, D)


def xla_decode_attention(q, k_cache, v_cache, pos, key_valid=None,
                         sm_scale=None):
    """Reference/fallback path in pure XLA. q: [B, H, D];
    k_cache/v_cache: [B, S, Hkv * D]; pos: scalar (last live key,
    inclusive)."""
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    Hkv = KV // D
    rep = H // Hkv
    scale = sm_scale if sm_scale is not None else D ** -0.5
    qg = q.reshape(B, Hkv, rep, D)
    kh = k_cache.reshape(B, S, Hkv, D)
    vh = v_cache.reshape(B, S, Hkv, D)
    scores = jnp.einsum(
        "bhgd,bshd->bhgs", qg.astype(jnp.float32), kh.astype(jnp.float32)
    ) * scale
    valid = jnp.arange(S)[None, None, None, :] <= pos
    if key_valid is not None:
        valid = jnp.logical_and(valid, key_valid[:, None, None, :])
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, vh.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


def _pick_block_s(S: int, vmem_budget_bytes: int, row_bytes: int) -> int:
    """Largest block_s in {256, ..., 8} dividing S whose 4 in-flight
    (double-buffered) K+V blocks fit the scoped-VMEM budget. row_bytes =
    bytes per cache slot across (B, KV) — lane-dense, no tile padding."""
    for bs in (256, 128, 64, 32, 16, 8):
        if S % bs == 0 and 4 * bs * row_bytes <= vmem_budget_bytes:
            return bs
    return 0


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    pos: jax.Array,
    key_valid: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """One-token decode attention over a KV cache.

    q: [B, H, D] (current token); k_cache/v_cache: [B, S, Hkv * D] (heads
    fused into one lane-dense dim); pos: scalar int32 absolute position of
    the current token (its K/V must already be written to the cache);
    key_valid: optional [B, S] bool marking cache slots usable as keys (the
    emb_masks path). Returns [B, H, D] in q.dtype. `use_pallas=None`
    auto-selects; the Pallas path covers MHA with a 128-multiple KV width —
    GQA and tiny test geometries use the XLA path.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    # ~12 MB of the default 16 MB scoped-VMEM budget for the 4 in-flight
    # (double-buffered) K+V blocks
    block_s = _pick_block_s(S, 12 << 20, B * KV * k_cache.dtype.itemsize)
    if (not use_pallas or H * D != KV or KV % 128 != 0 or block_s == 0
            or B > 128):
        return xla_decode_attention(
            q, k_cache, v_cache, pos, key_valid, sm_scale
        )
    scale = sm_scale if sm_scale is not None else D ** -0.5
    return _pallas_decode(
        q, k_cache, v_cache, pos, key_valid, scale, block_s, D
    )
