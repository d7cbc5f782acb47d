"""Per-row KV-cache row writes for speculative decoding (Pallas), XLA fallback.

Speculative decoding advances batch rows unevenly, so each iteration must
write G K/V rows at a DIFFERENT cache offset per batch row (reference
decodes strictly one token for the whole batch — ar/generate.py:105-123 —
and never needs this). XLA has no in-place primitive for that: scatter,
vmapped dynamic_update_slice, and a hand-built one-hot+select all lower to a
full-cache rewrite (~560 us per k+v pair of [16,1024,1280] bf16 buffers
inside a fori_loop, measured on a v5e 2026-08-19 with
tools/check_cache_update_tpu.py), which alone made the speculative loop
SLOWER than the plain decode it amortizes (~35 such writes per iteration
across target+draft layers).

This kernel does the minimal read-modify-write instead — and does it
LATENCY-FIRST, which measurement showed matters more than bytes: a
one-program-per-row grid serializes its 4 DMA waits per row (~30 us/row,
~500 us total — no better than XLA). Here each program handles a CHUNK of
bc batch rows and puts all 2*bc input-window copies in flight before
waiting, overwrites the G target sublanes of every window with fused
vector selects (a dynamic sublane-offset store does not lower — Mosaic
needs static tile alignment), then streams all 2*bc output copies. Windows
of different batch rows live in different cache rows, so the copies never
overlap. Bytes moved: O(bc * WL * KV) per program (~160 KB/row at the
bench geometry) instead of O(S * KV) per buffer (~84 MB).

int8 caches' [S, 128] fp32 scale planes (lane = batch row) are updated
with the plain XLA scatter: a full-plane rewrite is 512 KB — noise next to
the k/v buffers, and simpler than the overlap-safe kernel it replaces.

Public entry: `write_rows_per_row(lc, rows_k, rows_v, pos)` — takes and
returns the layer-cache dict used by models/larp_ar.py (keys 'k'/'v' and
optionally 'ks'/'vs'), quantizing rows itself for int8 caches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _pallas_call
from .decode_attention import _quantize_rows

_ALIGN = 32  # sublane alignment valid for fp32/bf16/int8 tiles alike


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_start(p, S: int, WL: int):
    w = jnp.clip((p // _ALIGN) * _ALIGN, 0, S - WL)
    # Mosaic cannot prove the clip of a //-rounded value stays 32-aligned;
    # assert it (it is: S % 32 == 0 and WL % 32 == 0)
    return pl.multiple_of(w, _ALIGN)


def _rows_kernel(pos_ref, rk_ref, rv_ref, pos2d_ref, k_hbm, v_hbm, ok_hbm,
                 ov_hbm, wk, wv, k_in, v_in, k_out, v_out, *, WL: int,
                 S: int, G: int, bc: int):
    base = pl.program_id(0) * bc

    def copies(j, inward):
        b = base + j
        w = _window_start(pos_ref[b], S, WL)
        win_k = ok_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :]
        win_v = ov_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :]
        buf_k = wk.at[pl.ds(j, 1)]
        buf_v = wv.at[pl.ds(j, 1)]
        if inward:
            return (
                pltpu.make_async_copy(win_k, buf_k, k_in.at[j]),
                pltpu.make_async_copy(win_v, buf_v, v_in.at[j]),
            )
        return (
            pltpu.make_async_copy(buf_k, win_k, k_out.at[j]),
            pltpu.make_async_copy(buf_v, win_v, v_out.at[j]),
        )

    # all 2*bc input window copies in flight before the first wait — the
    # whole point (serial wait-per-row measured ~30 us/row of pure latency)
    for j in range(bc):
        for c in copies(j, True):
            c.start()
    for j in range(bc):
        for c in copies(j, True):
            c.wait()

    # vectorized overwrite of sublanes [o_b, o_b + G) in every window.
    # A dynamic sublane-offset vector store (wk[j, pl.ds(o, G), :] = ...)
    # does NOT lower: Mosaic requires static proof that a sublane index is
    # tile-aligned, and o = pos[b] mod 32 is arbitrary. G fused vector
    # selects instead — G is small and static, bc*WL*KV is ~1M lanes of
    # VPU work, trivial next to the DMAs this kernel exists to shrink.
    KV = rk_ref.shape[-1]
    pos_col = pos2d_ref[:, :1]  # [bc, 1] this chunk's positions
    w_col = jnp.clip((pos_col // _ALIGN) * _ALIGN, 0, S - WL)
    o = (pos_col - w_col)[:, :, None]  # [bc, 1, 1]
    row = jax.lax.broadcasted_iota(jnp.int32, (bc, WL, KV), 1)
    k_win = wk[...]
    v_win = wv[...]
    for g in range(G):
        hit = row == o + g
        k_win = jnp.where(hit, rk_ref[:, g][:, None, :], k_win)
        v_win = jnp.where(hit, rv_ref[:, g][:, None, :], v_win)
    wk[...] = k_win
    wv[...] = v_win

    for j in range(bc):
        for c in copies(j, False):
            c.start()
    for j in range(bc):
        for c in copies(j, False):
            c.wait()


def _pick_rows_chunk(B: int, WL: int, KV: int, itemsize: int) -> int:
    """Largest divisor of B whose two [bc, WL, KV] window buffers fit a
    ~8 MB VMEM budget (the DMA-latency win saturates once all of a
    program's copies overlap)."""
    budget = 8 * (1 << 20)
    bc = B
    while bc > 1 and 2 * bc * WL * KV * itemsize > budget:
        bc //= 2
    return bc if B % bc == 0 else 1


def _pallas_write_rows(k_cache, v_cache, rows_k, rows_v, pos):
    B, G, KV = rows_k.shape
    S = k_cache.shape[1]
    WL = _ALIGN + _round_up(G, _ALIGN)
    bc = _pick_rows_chunk(B, WL, KV, k_cache.dtype.itemsize)
    pos2d = jnp.broadcast_to(pos[:, None].astype(jnp.int32), (B, 128))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, G, KV), lambda i, pos: (i, 0, 0)),
            pl.BlockSpec((bc, G, KV), lambda i, pos: (i, 0, 0)),
            pl.BlockSpec((bc, 128), lambda i, pos: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc, WL, KV), k_cache.dtype),
            pltpu.VMEM((bc, WL, KV), v_cache.dtype),
        ] + [pltpu.SemaphoreType.DMA((bc,))] * 4,
    )
    fn = _pallas_call(
        functools.partial(_rows_kernel, WL=WL, S=S, G=G, bc=bc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},  # caches (after scalar operand)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return fn(pos, rows_k.astype(k_cache.dtype), rows_v.astype(v_cache.dtype),
              pos2d, k_cache, v_cache)


def _xla_write_rows(cache, rows, pos):
    B, G, _ = rows.shape
    bidx = jnp.arange(B)[:, None]
    pidx = pos[:, None] + jnp.arange(G)[None, :]
    return cache.at[bidx, pidx].set(rows.astype(cache.dtype))


def _xla_write_planes(plane, scale, pos):
    B, G = scale.shape
    pidx = pos[:, None] + jnp.arange(G)[None, :]
    return plane.at[pidx, jnp.arange(B)[:, None]].set(
        scale.astype(plane.dtype)
    )


def write_rows_per_row(lc: dict, rows_k: jax.Array, rows_v: jax.Array,
                       pos: jax.Array, use_pallas=None) -> dict:
    """Write [B, G, KV] K/V rows into the layer cache dict at PER-ROW
    positions pos[b] + g. int8 caches (scale planes 'ks'/'vs' present)
    quantize per row first; the tiny [S, 128] scale planes always update
    via the XLA scatter. Pallas on TPU when shapes allow; XLA scatter
    otherwise (tiny test geometries, CPU)."""
    from .attention import _INTERPRET

    B, G, KV = rows_k.shape
    S = lc["k"].shape[1]
    WL = _ALIGN + _round_up(G, _ALIGN)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" or _INTERPRET
    use_pallas = (
        use_pallas and KV % 128 == 0 and S >= WL and S % _ALIGN == 0
    )
    out = dict(lc)
    quantized = "ks" in lc
    if quantized and B > 128:
        # the [S, 128] scale-plane layout stores batch in the lane dim
        # (ops/decode_attention.py); rows b >= 128 would be silently
        # dropped by the decode kernel and clamped by the XLA scatter alike
        raise ValueError(
            f"int8 KV caches support batch <= 128, got {B} "
            "(scale planes are [S, 128] with batch in the lane dim)"
        )
    if quantized:
        qk, sk = _quantize_rows(rows_k)
        qv, sv = _quantize_rows(rows_v)
        if use_pallas:
            out["k"], out["v"] = _pallas_write_rows(
                lc["k"], lc["v"], qk, qv, pos
            )
        else:
            out["k"] = _xla_write_rows(lc["k"], qk, pos)
            out["v"] = _xla_write_rows(lc["v"], qv, pos)
        out["ks"] = _xla_write_planes(lc["ks"], sk, pos)
        out["vs"] = _xla_write_planes(lc["vs"], sv, pos)
    else:
        if use_pallas:
            out["k"], out["v"] = _pallas_write_rows(
                lc["k"], lc["v"], rows_k, rows_v, pos
            )
        else:
            out["k"] = _xla_write_rows(lc["k"], rows_k, pos)
            out["v"] = _xla_write_rows(lc["v"], rows_v, pos)
    return out
