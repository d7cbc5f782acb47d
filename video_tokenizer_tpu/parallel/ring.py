"""Ring attention: sequence parallelism over the device mesh.

The reference has NO long-context machinery (SURVEY.md §5: no ring attention,
no Ulysses — its longest sequence, 2048 patches + 1024 latents, fits one
GPU). This module goes beyond parity: clips longer than one chip's memory
shard their sequence over a mesh axis, and attention runs as a ring — each
device computes local flash attention against the K/V shard it currently
holds, rotates K/V to its neighbor with `jax.lax.ppermute` (ICI), and merges
partial results with the log-sum-exp statistic from the Pallas kernel:

  merged = (out_a * exp(lse_a - m) + out_b * exp(lse_b - m)) / (exp(...)+exp(...))

Causality across shards (equal, contiguous, mesh-ordered): a 3-way branch
per step — the diagonal shard runs causal attention (offset 0), wholly-past
shards run full attention, wholly-future shards contribute nothing and skip
the kernel entirely (their lse stays at the -1e30 init).

Memory: O(S_local) per device in BOTH directions. The forward is wrapped in
a `jax.custom_vjp` whose residuals are only (q, k, v, out, lse) — local
shards. The backward is a SECOND ring pass that re-rotates K/V instead of
replaying saved carries: at each step the device computes this (q-shard,
visiting k-shard) block's gradient contributions from the flash-backward
identity p_ij = exp(q_i.k_j * scale - lse_i) using the GLOBAL lse/delta
saved from the forward (so no per-block renormalization is needed), then
rotates (k, v, dk, dv) together — after P steps every dk/dv shard has
visited all query shards and is home. On TPU the per-block gradients reuse
the Pallas flash-backward kernels (`ops.attention._flash_bwd`) with the
global statistics injected as residuals.

Usage: inside `shard_map` over a mesh with the sequence axis (see
tests/test_ring.py), via `ring_attention_sharded` which wraps shard_map, or
ambiently via the `ring_sequence(mesh)` context — models whose attention
goes through `ops.attention.attention` pick it up with no code changes
(cfg `mesh_seq: N` in the trainers).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention_with_lse


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two attention partials over disjoint key sets."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    out = (
        out_a.astype(jnp.float32) * jnp.swapaxes(wa, 1, 2)[..., None]
        + out_b.astype(jnp.float32) * jnp.swapaxes(wb, 1, 2)[..., None]
    ) / jnp.swapaxes(denom, 1, 2)[..., None]
    return out.astype(out_a.dtype), m + jnp.log(denom)


def _ring_fwd_pass(q, k, v, axis_name, causal, sm_scale, use_pallas):
    """The forward ring. Returns (out [B,S,H,D] in q.dtype, lse [B,H,S]
    fp32). Never differentiated through — the custom VJP below supplies the
    backward ring."""
    P_ = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    NEG = jnp.float32(-1e30)

    def step_fn(carry, step):
        k_cur, v_cur, out, lse = carry
        src = jnp.mod(my - step, P_)  # which shard's K/V we currently hold
        if causal:
            # 3-way switch — the future branch returns without running the
            # kernel at all, so ~half the off-diagonal device-steps of a
            # causal ring do no attention work.
            def future_branch(args):
                qq, _, _ = args
                B_, S_, H_, _ = qq.shape
                return (
                    jnp.zeros_like(qq),
                    jnp.full((B_, H_, S_), NEG, jnp.float32),
                )

            def diag_branch(args):
                qq, kk, vv = args
                return attention_with_lse(
                    qq, kk, vv, causal=True, sm_scale=sm_scale,
                    causal_offset=0, use_pallas=use_pallas,
                )

            def past_branch(args):
                qq, kk, vv = args
                return attention_with_lse(
                    qq, kk, vv, causal=False, sm_scale=sm_scale,
                    use_pallas=use_pallas,
                )

            idx = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
            o_step, l_step = jax.lax.switch(
                idx, (future_branch, diag_branch, past_branch),
                (q, k_cur, v_cur),
            )
        else:
            o_step, l_step = attention_with_lse(
                q, k_cur, v_cur, causal=False, sm_scale=sm_scale,
                use_pallas=use_pallas,
            )
        out, lse = _merge(out, lse, o_step, l_step)
        perm = [(i, (i + 1) % P_) for i in range(P_)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, out, lse), None

    B, S, H, D = q.shape
    # fp32 accumulator carried through all P merges; cast once at the end
    # (re-rounding to bf16 every step would accumulate ~P*2^-8 error)
    out0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full((B, H, S), NEG, jnp.float32)
    (k_f, v_f, out, lse), _ = jax.lax.scan(
        step_fn, (k, v, out0, lse0), jnp.arange(P_)
    )
    return out.astype(q.dtype), lse


def _xla_block_grads(q, k, v, out, lse, do, causal, scale):
    """Gradient contributions of ONE (q-shard, k-shard) block of the global
    softmax, from the flash-backward identity with the GLOBAL statistics:
    p_ij = exp(q_i.k_j * scale - lse_i), delta_i = sum_d do_id * out_id.
    q/k/v/out/do: [B, S, H, D]; lse: [B, H, Sq] fp32. causal masks at
    offset 0 (the ring's diagonal block)."""
    B, Sq, H, D = q.shape
    Sk, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    if rep > 1:  # GQA: expand for the math, group-sum dk/dv at the end
        kf = jnp.repeat(kf, rep, axis=2)
        vf = jnp.repeat(vf, rep, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    p = jnp.exp(s - lse[..., None])
    if causal:
        mask = jnp.arange(Sq)[:, None] >= jnp.arange(Sk)[None, :]
        p = jnp.where(mask[None, None], p, 0.0)
    do32 = do.astype(jnp.float32)
    delta = jnp.einsum("bqhd,bqhd->bhq", do32, out.astype(jnp.float32))
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do32, vf)
    ds = p * (dp - delta[..., None]) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32))
    if rep > 1:
        dk = dk.reshape(B, Sk, Hkv, rep, D).sum(3)
        dv = dv.reshape(B, Sk, Hkv, rep, D).sum(3)
    return dq, dk, dv


def _pallas_block_grads(q, k, v, out, lse, do, causal, scale):
    """Same contract as `_xla_block_grads`, via the Pallas flash-backward
    kernels (ops.attention._flash_bwd) with the ring's GLOBAL out/lse
    injected as residuals — the kernels use the provided lse (and delta
    recomputed from the provided out) without renormalizing, which is
    exactly the blockwise decomposition of the global softmax gradient."""
    from ..ops.attention import _flash_bwd, _pick_block

    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    t = lambda x: jnp.swapaxes(x, 1, 2)  # BSHD <-> BHSD
    q_seg = jnp.zeros((B, 1, Sq), jnp.int32)
    k_seg = jnp.zeros((B, 1, Sk), jnp.int32)
    res = (t(q), t(k), t(v), q_seg, k_seg, t(out), lse[:, :, None, :])
    dq, dk, dv, _, _ = _flash_bwd(
        res, t(do), scale, causal,
        _pick_block(Sq, 256), _pick_block(Sk, 1024), has_segments=False,
    )
    return t(dq), t(dk), t(dv)


def _ring_bwd_pass(res, do, axis_name, causal, sm_scale, use_pallas):
    """The backward ring: re-rotates K/V (and the dk/dv accumulators with
    them) instead of replaying saved forward carries — per-device memory is
    O(S_local) while a scan-AD backward would hold P rotated K/V copies."""
    q, k, v, out, lse = res
    P_ = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    D = q.shape[-1]
    scale = sm_scale if sm_scale is not None else D ** -0.5
    if use_pallas is None:
        pallas = jax.default_backend() == "tpu"
    else:
        pallas = use_pallas
    block = _pallas_block_grads if pallas else _xla_block_grads

    def zeros_branch(args):
        qq, kk, vv = args
        return (
            jnp.zeros(qq.shape, jnp.float32),
            jnp.zeros(kk.shape, jnp.float32),
            jnp.zeros(vv.shape, jnp.float32),
        )

    def diag_branch(args):
        qq, kk, vv = args
        dq, dk, dv = block(qq, kk, vv, out, lse, do, True, scale)
        return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                dv.astype(jnp.float32))

    def past_branch(args):
        qq, kk, vv = args
        dq, dk, dv = block(qq, kk, vv, out, lse, do, False, scale)
        return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                dv.astype(jnp.float32))

    def step_fn(carry, step):
        k_cur, v_cur, dk_cur, dv_cur, dq = carry
        src = jnp.mod(my - step, P_)
        if causal:
            idx = jnp.where(src > my, 0, jnp.where(src == my, 1, 2))
            dq_b, dk_b, dv_b = jax.lax.switch(
                idx, (zeros_branch, diag_branch, past_branch),
                (q, k_cur, v_cur),
            )
        else:
            dq_b, dk_b, dv_b = past_branch((q, k_cur, v_cur))
        dq = dq + dq_b
        dk_cur = dk_cur + dk_b
        dv_cur = dv_cur + dv_b
        perm = [(i, (i + 1) % P_) for i in range(P_)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (k_f, v_f, dk, dv, dq), _ = jax.lax.scan(
        step_fn, (k, v, dk0, dv0, dq0), jnp.arange(P_)
    )
    # after P rotations the dk/dv accumulators are home with their shards
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_attention(q, k, v, axis_name, causal, sm_scale, use_pallas):
    out, _ = _ring_fwd_pass(q, k, v, axis_name, causal, sm_scale, use_pallas)
    return out


def _ring_attention_fwd(q, k, v, axis_name, causal, sm_scale, use_pallas):
    out, lse = _ring_fwd_pass(
        q, k, v, axis_name, causal, sm_scale, use_pallas
    )
    return out, (q, k, v, out, lse)


def _ring_attention_bwd(axis_name, causal, sm_scale, use_pallas, res, do):
    return _ring_bwd_pass(res, do, axis_name, causal, sm_scale, use_pallas)


_ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


def ring_attention_local(
    q, k, v, axis_name: str, causal: bool = False,
    sm_scale: Optional[float] = None, use_pallas: Optional[bool] = None,
):
    """Per-shard body (call inside shard_map). q/k/v: local [B, S_loc, H, D].

    Sequence is assumed sharded contiguously along `axis_name` in mesh order.
    Differentiable with O(S_local) memory (see module docstring).
    """
    return _ring_attention(q, k, v, axis_name, causal, sm_scale, use_pallas)


def ring_attention_sharded(
    q, k, v, mesh: Mesh, axis_name: str = "data", causal: bool = False,
    sm_scale: Optional[float] = None, use_pallas: Optional[bool] = None,
):
    """q/k/v: GLOBAL [B, S, H, D]; sequence dim sharded over `axis_name`."""
    fn = functools.partial(
        ring_attention_local, axis_name=axis_name, causal=causal,
        sm_scale=sm_scale, use_pallas=use_pallas,
    )
    spec = P(None, axis_name, None, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


class ring_sequence:
    """Context manager: trace jitted steps inside it and every
    `ops.attention.attention` call whose shapes allow it routes through
    `ring_attention_sharded` over `mesh`'s `axis` — context parallelism with
    NO model changes (cfg `mesh_seq: N` enters this in the trainers, the
    ambient-context pattern of parallel.tp.sequence_parallel). Attention
    calls that cannot ring (segment ids, cross-length q/kv, sequence not
    divisible by the axis) fall through to the normal kernel."""

    def __init__(self, mesh: Mesh, axis: str = "seq"):
        self.mesh = mesh
        self.axis = axis

    def __enter__(self):
        from ..ops.attention import _ring_ambient

        _ring_ambient.cfg = self
        return self

    def __exit__(self, *exc):
        from ..ops.attention import _ring_ambient

        _ring_ambient.cfg = None
