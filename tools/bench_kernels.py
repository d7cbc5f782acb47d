"""Microbench for this round's kernel changes — run once on the TPU.

Covers, with before/after comparisons where the old behavior is still
expressible:

  1. Flash-attention fwd+bwd at an off-block sequence length (Sk=3200):
     divisor-rule `_pick_block` (auto) vs the old pad-to-full-block size
     (explicit block_k=3072 pads Sk to 6144 — the old default's behavior).
  2. GQA training attention: native kv_heads K/V (h//rep index map) vs the
     old jnp.repeat-to-q_heads expansion.
  3. Decode attention at the flagship llama-abs-LP geometry: the new
     no-bias kernel (key_valid=None) vs the bias-plane path (key_valid all
     True — identical math, carries the old extra DMA stream).

Timing on the axon tunnel: block_until_ready can return early, so every
measurement fetches a scalar to force completion.

Usage: python tools/bench_kernels.py [--iters N]
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)  # compile
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    from video_tokenizer_tpu.ops.attention import attention
    from video_tokenizer_tpu.ops.decode_attention import decode_attention

    it = args.iters
    print(f"backend: {jax.default_backend()}  iters: {it}")

    # --- 1. off-block seq length: divisor blocks vs pad-to-full-block ----
    B, S, H, D = 4, 3200, 8, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)

    fwd_auto = jax.jit(lambda q, k, v: attention(q, k, v, use_pallas=True))
    # the old default: block_k=3072 does not divide 3328, so Sk pads to 6144
    fwd_old = jax.jit(partial(
        attention, use_pallas=True, block_q=512, block_k=3072,
    ))
    t_auto = timeit(fwd_auto, q, k, v, iters=it)
    t_old = timeit(fwd_old, q, k, v, iters=it)
    print(f"[1] fwd S=3200   auto(_pick_block): {t_auto*1e3:8.3f} ms   "
          f"old(pad-to-6144): {t_old*1e3:8.3f} ms   "
          f"speedup {t_old/t_auto:.2f}x")

    g_auto = jax.jit(jax.grad(
        lambda q, k, v: attention(q, k, v, use_pallas=True)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    g_old = jax.jit(jax.grad(
        lambda q, k, v: attention(
            q, k, v, use_pallas=True, block_q=512, block_k=3072,
            bwd_block_q=256, bwd_block_k=1024,
        ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    t_auto = timeit(g_auto, q, k, v, iters=max(4, it // 4))
    t_old = timeit(g_old, q, k, v, iters=max(4, it // 4))
    print(f"[1] fwd+bwd      auto(_pick_block): {t_auto*1e3:8.3f} ms   "
          f"old blocks      : {t_old*1e3:8.3f} ms   "
          f"speedup {t_old/t_auto:.2f}x")

    # --- 2. GQA: native kv_heads vs repeat-to-q_heads --------------------
    B, S, H, Hkv, D = 4, 2048, 16, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    kg = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.bfloat16)
    vg = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.bfloat16)

    gqa_native = jax.jit(
        lambda q, k, v: attention(q, k, v, causal=True, use_pallas=True))
    gqa_rep = jax.jit(lambda q, k, v: attention(
        q, jnp.repeat(k, H // Hkv, axis=2), jnp.repeat(v, H // Hkv, axis=2),
        causal=True, use_pallas=True))
    t_nat = timeit(gqa_native, q, kg, vg, iters=it)
    t_rep = timeit(gqa_rep, q, kg, vg, iters=it)
    print(f"[2] GQA fwd 16/4 native: {t_nat*1e3:8.3f} ms   "
          f"repeat: {t_rep*1e3:8.3f} ms   speedup {t_rep/t_nat:.2f}x")

    gqa_native_g = jax.jit(jax.grad(
        lambda q, k, v: attention(q, k, v, causal=True, use_pallas=True)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    gqa_rep_g = jax.jit(jax.grad(
        lambda q, k, v: attention(
            q, jnp.repeat(k, H // Hkv, axis=2),
            jnp.repeat(v, H // Hkv, axis=2), causal=True, use_pallas=True,
        ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    t_nat = timeit(gqa_native_g, q, kg, vg, iters=max(4, it // 4))
    t_rep = timeit(gqa_rep_g, q, kg, vg, iters=max(4, it // 4))
    print(f"[2] GQA fwd+bwd  native: {t_nat*1e3:8.3f} ms   "
          f"repeat: {t_rep*1e3:8.3f} ms   speedup {t_rep/t_nat:.2f}x")

    # --- 3. decode: no-bias kernel vs bias-plane path --------------------
    # llama-abs-LP serving geometry: 20 KV heads x 64 = KV 1280, S 1152
    B, S, Hq, D = 16, 1152, 20, 64
    rng = np.random.RandomState(0)
    qd = jnp.asarray(rng.randn(B, Hq, D), jnp.bfloat16)
    kc = jnp.asarray(rng.randn(B, S, Hq * D), jnp.bfloat16)
    vc = jnp.asarray(rng.randn(B, S, Hq * D), jnp.bfloat16)
    pos = jnp.int32(S - 1)
    all_valid = jnp.ones((B, S), bool)

    dec_nobias = jax.jit(lambda q, k, v, p: decode_attention(
        q, k, v, p, use_pallas=True))
    dec_bias = jax.jit(lambda q, k, v, p: decode_attention(
        q, k, v, p, key_valid=all_valid, use_pallas=True))
    t_nb = timeit(dec_nobias, qd, kc, vc, pos, iters=it * 4)
    t_b = timeit(dec_bias, qd, kc, vc, pos, iters=it * 4)
    print(f"[3] decode B=16  no-bias: {t_nb*1e6:8.1f} us   "
          f"bias-plane: {t_b*1e6:8.1f} us   speedup {t_b/t_nb:.2f}x")

    # parity spot-checks on hardware (cheap insurance while we're here)
    o1 = np.asarray(dec_nobias(qd, kc, vc, pos), np.float32)
    o2 = np.asarray(dec_bias(qd, kc, vc, pos), np.float32)
    rel = np.max(np.abs(o1 - o2)) / (np.max(np.abs(o2)) + 1e-6)
    print(f"[3] no-bias == all-valid bias: rel {rel:.2e}")
    on = np.asarray(gqa_native(q, kg, vg), np.float32)
    orp = np.asarray(gqa_rep(q, kg, vg), np.float32)
    rel = np.max(np.abs(on - orp)) / (np.max(np.abs(orp)) + 1e-6)
    print(f"[2] GQA native == repeat: rel {rel:.2e}")


if __name__ == "__main__":
    main()
