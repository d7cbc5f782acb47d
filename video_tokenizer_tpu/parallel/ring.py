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

Memory note: the forward scan's AD residuals still store each step's K/V
carry, so training memory scales with the global sequence; the per-step
attention residuals are dropped via jax.checkpoint (recomputed in the
backward). A custom backward ring pass (re-rotating K/V instead of saving
carries) is the known remaining step toward O(S_local) training memory.

Usage: inside `shard_map` over a mesh with the sequence axis (see
tests/test_ring.py), or via `ring_attention_sharded` which wraps shard_map.
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


def ring_attention_local(
    q, k, v, axis_name: str, causal: bool = False,
    sm_scale: Optional[float] = None, use_pallas: Optional[bool] = None,
):
    """Per-shard body (call inside shard_map). q/k/v: local [B, S_loc, H, D].

    Sequence is assumed sharded contiguously along `axis_name` in mesh order.
    """
    P_ = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    S_loc = q.shape[1]
    NEG = jnp.float32(-1e30)

    def step_fn(carry, step):
        k_cur, v_cur, out, lse = carry
        src = jnp.mod(my - step, P_)  # which shard's K/V we currently hold
        if causal:
            # 3-way switch — the future branch returns without running the
            # kernel at all, so ~half the off-diagonal device-steps of a
            # causal ring do no attention work (and no backward recompute).
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
    # checkpoint: drop the per-step attention residuals (recomputed in the
    # backward) — see the module docstring's memory note
    (k_f, v_f, out, lse), _ = jax.lax.scan(
        jax.checkpoint(step_fn), (k, v, out0, lse0), jnp.arange(P_)
    )
    return out.astype(q.dtype)


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
