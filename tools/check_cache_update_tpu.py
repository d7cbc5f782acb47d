"""On-TPU compile + parity + microbench for the speculative-decoding kernels.

Validates on real hardware what tests/test_pallas_interpret.py pins in
interpret mode (ADVICE round 2: the first version of the rows kernel failed
Mosaic compilation with a dynamic sublane-offset store — interpret mode
cannot catch that class of bug):

  1. ops/cache_update.write_rows_per_row — bf16 and int8(+scale planes)
     caches at the bench geometry, vs the XLA scatter.
  2. ops/decode_attention.chunk_attention — vs xla_chunk_attention.
  3. microbench both against the XLA paths they replace.

Run: python tools/check_cache_update_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from video_tokenizer_tpu.ops import cache_update as cu  # noqa: E402
from video_tokenizer_tpu.ops import decode_attention as da  # noqa: E402


def timeit_chained(step, carry0, iters=100):
    """us per step. `step(carry, i) -> carry` is chained `iters` times inside
    ONE jitted lax.fori_loop, so per-dispatch tunnel latency (~2 ms on axon,
    larger than the ops under test) is amortized away; one scalar fetch at
    the end forces completion."""
    @jax.jit
    def run(carry):
        carry = jax.lax.fori_loop(0, iters, step, carry)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)), carry
        )

    jax.tree_util.tree_map(float, run(carry0))  # compile + warmup
    t0 = time.perf_counter()
    jax.tree_util.tree_map(float, run(carry0))
    return (time.perf_counter() - t0) / iters * 1e6  # us


def check_rows(dtype, quantized, B=16, S=1024, KV=1280, G=5):
    rng = np.random.RandomState(0)
    lc = {
        "k": jnp.asarray(rng.randn(B, S, KV), dtype),
        "v": jnp.asarray(rng.randn(B, S, KV), dtype),
    }
    if quantized:
        lc["ks"] = jnp.zeros((S, 128), jnp.float32)
        lc["vs"] = jnp.zeros((S, 128), jnp.float32)
    rk = jnp.asarray(rng.randn(B, G, KV), jnp.float32)
    rv = jnp.asarray(rng.randn(B, G, KV), jnp.float32)
    pos = jnp.asarray(rng.randint(0, S - G, size=(B,)), jnp.int32)

    f_pl = jax.jit(lambda lc, rk, rv, pos: cu.write_rows_per_row(
        lc, rk, rv, pos, use_pallas=True))
    f_x = jax.jit(lambda lc, rk, rv, pos: cu.write_rows_per_row(
        lc, rk, rv, pos, use_pallas=False))
    got, want = f_pl(lc, rk, rv, pos), f_x(lc, rk, rv, pos)
    for name in got:
        a = np.asarray(got[name], np.float32)
        b = np.asarray(want[name], np.float32)
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)

    def mk_step(use_pallas):
        def step(i, carry):
            lc = carry
            p = (pos + i) % (S - G)
            return cu.write_rows_per_row(lc, rk, rv, p,
                                         use_pallas=use_pallas)
        return step

    t_pl = timeit_chained(mk_step(True), lc)
    t_x = timeit_chained(mk_step(False), lc)
    tag = f"{np.dtype(dtype).name}{'+scales' if quantized else ''}"
    print(f"rows[{tag}]: pallas {t_pl:8.1f} us  xla {t_x:8.1f} us  "
          f"({t_x / t_pl:4.1f}x)")


def check_chunk(quantized, B=16, S=1024, H=20, D=64, G=5):
    rng = np.random.RandomState(1)
    KV = H * D
    q = jnp.asarray(rng.randn(B, G, H, D), jnp.bfloat16)
    if quantized:
        kf = rng.randn(B, S, KV)
        vf = rng.randn(B, S, KV)
        kc, ks = da._quantize_rows(jnp.asarray(kf, jnp.float32))
        vc, vs = da._quantize_rows(jnp.asarray(vf, jnp.float32))
        ksp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(ks.T)
        vsp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(vs.T)
    else:
        kc = jnp.asarray(rng.randn(B, S, KV), jnp.bfloat16)
        vc = jnp.asarray(rng.randn(B, S, KV), jnp.bfloat16)
        ksp = vsp = None
    pos = jnp.asarray(rng.randint(0, S - G, size=(B,)), jnp.int32)

    f_pl = jax.jit(lambda q, kc, vc, pos: da.chunk_attention(
        q, kc, vc, pos, k_scale=ksp, v_scale=vsp, use_pallas=True))
    f_x = jax.jit(lambda q, kc, vc, pos: da.xla_chunk_attention(
        q, kc, vc, pos, k_scale=ksp, v_scale=vsp))
    got = np.asarray(f_pl(q, kc, vc, pos), np.float32)
    want = np.asarray(f_x(q, kc, vc, pos), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2)

    def mk_step(fn):
        def step(i, carry):
            o, p = carry
            p = (p + 1) % (S - G)
            o = fn(q + o[:, :1] * 1e-6, kc, vc, p).astype(q.dtype)
            return (o, p)
        return step

    o0 = jnp.zeros_like(q)
    t_pl = timeit_chained(
        mk_step(lambda qq, kk, vv, pp: da.chunk_attention(
            qq, kk, vv, pp, k_scale=ksp, v_scale=vsp, use_pallas=True)),
        (o0, pos),
    )
    t_x = timeit_chained(
        mk_step(lambda qq, kk, vv, pp: da.xla_chunk_attention(
            qq, kk, vv, pp, k_scale=ksp, v_scale=vsp)),
        (o0, pos),
    )
    tag = "int8" if quantized else "bf16"
    print(f"chunk[{tag}]: pallas {t_pl:8.1f} us  xla {t_x:8.1f} us  "
          f"({t_x / t_pl:4.1f}x)")


def check_control(B=16, S=1024, KV=1280, G=5):
    """Control: the plain loop's scalar-position dynamic_update_slice in the
    SAME chained-fori harness. If this also measures hundreds of us, the
    harness (loop-carry copies) is being measured, not the ops."""
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(B, S, KV), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, KV), jnp.bfloat16)
    rows = jnp.asarray(rng.randn(B, G, KV), jnp.bfloat16)

    def step(i, carry):
        k, v = carry
        p = i % (S - G)
        k = jax.lax.dynamic_update_slice(k, rows, (0, p, 0))
        v = jax.lax.dynamic_update_slice(v, rows, (0, p, 0))
        return (k, v)

    t = timeit_chained(step, (k, v))
    print(f"control[scalar-pos DUS]: {t:8.1f} us")


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_control()
    check_rows(jnp.bfloat16, False)
    check_rows(jnp.int8, True)
    check_chunk(False)
    check_chunk(True)
    print("TPU cache-update/chunk kernels OK")


if __name__ == "__main__":
    sys.exit(main())
