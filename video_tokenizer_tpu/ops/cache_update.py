"""Per-row KV-cache row writes for speculative decoding (Pallas), XLA fallback.

Speculative decoding advances batch rows unevenly, so each iteration must
write G K/V rows at a DIFFERENT cache offset per batch row (reference
decodes strictly one token for the whole batch — ar/generate.py:105-123 —
and never needs this). XLA has no in-place primitive for that: scatter,
vmapped dynamic_update_slice, and a hand-built one-hot+select all lower to a
full-cache rewrite (527/597/572 us per [16,1024,1280] bf16 buffer on a v5e —
measured 2026-08-19), which made the speculative loop SLOWER than the plain
decode it amortizes (~60 such writes per iteration across target+draft
layers).

This kernel does the minimal read-modify-write instead: per batch row it
DMAs only the tile-aligned window of `WL` cache rows covering
[pos[b], pos[b] + G), overwrites the G rows in VMEM, and DMAs the window
back — O(WL * KV) bytes per row (~160 KB at the bench geometry) instead of
O(S * KV) per buffer (~84 MB). The window start is rounded down to a
32-sublane boundary, satisfying Mosaic's DMA tile alignment for every cache
dtype (fp32 8, bf16 16, int8 32 sublanes per tile); K and V are written in
one kernel launch. int8 caches' [S, 128] fp32 scale planes (lane = batch
row) get the same treatment in a second kernel — those windows OVERLAP
across batch rows, which is safe because TPU grid programs execute
sequentially on the core and each program blocks on its out-copy before
returning.

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


def _rows_kernel(pos_ref, rk_ref, rv_ref, k_hbm, v_hbm, ok_hbm, ov_hbm,
                 wk, wv, sk_in, sv_in, sk_out, sv_out, *, WL: int, S: int,
                 G: int):
    b = pl.program_id(0)
    p = pos_ref[b]
    w = jnp.clip((p // _ALIGN) * _ALIGN, 0, S - WL)
    o = p - w  # in [0, WL - G] given the caller invariant p <= S - G

    cp_k = pltpu.make_async_copy(
        ok_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :], wk, sk_in
    )
    cp_v = pltpu.make_async_copy(
        ov_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :], wv, sv_in
    )
    cp_k.start()
    cp_v.start()
    cp_k.wait()
    cp_v.wait()

    wk[0, pl.ds(o, G), :] = rk_ref[0]
    wv[0, pl.ds(o, G), :] = rv_ref[0]

    out_k = pltpu.make_async_copy(
        wk, ok_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :], sk_out
    )
    out_v = pltpu.make_async_copy(
        wv, ov_hbm.at[pl.ds(b, 1), pl.ds(w, WL), :], sv_out
    )
    out_k.start()
    out_v.start()
    out_k.wait()
    out_v.wait()


def _planes_kernel(pos_ref, sk_ref, sv_ref, ks_hbm, vs_hbm, oks_hbm,
                   ovs_hbm, wks, wvs, s_in1, s_in2, s_out1, s_out2, *,
                   WL: int, S: int, G: int):
    b = pl.program_id(0)
    p = pos_ref[b]
    w = jnp.clip((p // _ALIGN) * _ALIGN, 0, S - WL)
    o = p - w

    cp1 = pltpu.make_async_copy(oks_hbm.at[pl.ds(w, WL), :], wks, s_in1)
    cp2 = pltpu.make_async_copy(ovs_hbm.at[pl.ds(w, WL), :], wvs, s_in2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 1)
    ks = wks[...]
    vs = wvs[...]
    for g in range(G):  # G is small and static: G fused vector selects
        hit = jnp.logical_and(row == o + g, lane == b)
        ks = jnp.where(hit, sk_ref[0, g], ks)
        vs = jnp.where(hit, sv_ref[0, g], vs)
    wks[...] = ks
    wvs[...] = vs

    out1 = pltpu.make_async_copy(wks, oks_hbm.at[pl.ds(w, WL), :], s_out1)
    out2 = pltpu.make_async_copy(wvs, ovs_hbm.at[pl.ds(w, WL), :], s_out2)
    out1.start()
    out2.start()
    out1.wait()
    out2.wait()


def _pallas_write_rows(k_cache, v_cache, rows_k, rows_v, pos):
    B, G, KV = rows_k.shape
    S = k_cache.shape[1]
    WL = _ALIGN + _round_up(G, _ALIGN)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, G, KV), lambda b, pos: (b, 0, 0)),
            pl.BlockSpec((1, G, KV), lambda b, pos: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, WL, KV), k_cache.dtype),
            pltpu.VMEM((1, WL, KV), v_cache.dtype),
        ] + [pltpu.SemaphoreType.DMA] * 4,
    )
    fn = _pallas_call(
        functools.partial(_rows_kernel, WL=WL, S=S, G=G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},  # caches (after scalar operand)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return fn(pos, rows_k.astype(k_cache.dtype), rows_v.astype(v_cache.dtype),
              k_cache, v_cache)


def _pallas_write_planes(ks_plane, vs_plane, scale_k, scale_v, pos):
    B, G = scale_k.shape
    S = ks_plane.shape[0]
    WL = _ALIGN + _round_up(G, _ALIGN)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, G), lambda b, pos: (b, 0)),
            pl.BlockSpec((1, G), lambda b, pos: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((WL, 128), ks_plane.dtype),
            pltpu.VMEM((WL, 128), vs_plane.dtype),
        ] + [pltpu.SemaphoreType.DMA] * 4,
    )
    fn = _pallas_call(
        functools.partial(_planes_kernel, WL=WL, S=S, G=G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ks_plane.shape, ks_plane.dtype),
            jax.ShapeDtypeStruct(vs_plane.shape, vs_plane.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return fn(pos, scale_k.astype(ks_plane.dtype),
              scale_v.astype(vs_plane.dtype), ks_plane, vs_plane)


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
    quantize per row first. Pallas on TPU when shapes allow; XLA scatter
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
    if quantized:
        qk, sk = _quantize_rows(rows_k)
        qv, sv = _quantize_rows(rows_v)
        if use_pallas:
            out["k"], out["v"] = _pallas_write_rows(
                lc["k"], lc["v"], qk, qv, pos
            )
            out["ks"], out["vs"] = _pallas_write_planes(
                lc["ks"], lc["vs"], sk, sv, pos
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
