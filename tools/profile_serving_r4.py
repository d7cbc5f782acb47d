"""Round-4 serving attribution: decode step, w8 matmul tiles, spec loop.

One process (device init on the axon tunnel costs ~2 min), several
measurements, JSON-ish lines to stdout:

  1. w8_matmul microbench at decode M over every llama-abs-LP projection
     geometry — directly measures the block_n picker (ops/quant_matmul.py).
  2. Plain-dense (bf16) same geometries — the int8 win per projection.
  3. Full decode step pos-sweep (int8+int8kv), sample vs no-sample —
     t_fixed / kv_rate attribution (same fit as tools/profile_decode.py).
  4. Speculative-iteration pieces: one draft decode_chunk step (60M), one
     target chunk verify (G+1 positions, 632M), and the acceptance
     bookkeeping — where the VERDICT-r3 "spec loses to the plain loop"
     overhead actually sits.

Run:  python tools/profile_serving_r4.py [--skip-spec]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_RTT = [0.0]  # measured host<->device round-trip floor (tunnel ~25 ms)


def measure_rtt():
    """One dispatch + scalar fetch of a trivial program: the fixed cost every
    timed run pays once. On the axon tunnel this is ~25 ms — dividing it
    across too few scan iterations swamps any sub-ms kernel, so time_scan
    subtracts it and sizes iters accordingly."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    _RTT[0] = min(ts)
    print(f"host<->device RTT floor: {_RTT[0] * 1e3:.2f} ms", flush=True)


def time_scan(step, carry, iters=64):
    """Time `iters` sequential applications of `step` (carry -> carry)
    inside ONE jitted scan; returns seconds per application, with the
    measured dispatch/fetch RTT floor subtracted."""

    @jax.jit
    def run(carry):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32).ravel()[0].astype(
                jnp.float32),
            jax.tree_util.tree_leaves(c)[0],
        )

    float(run(carry))  # compile + warmup
    best = float("inf")
    for _ in range(3):  # min-of-3: the tunnel RTT has ±20 ms outliers
        t0 = time.perf_counter()
        float(run(carry))
        best = min(best, time.perf_counter() - t0)
    return max(best - _RTT[0], 0.0) / iters


def bench_w8_tiles():
    from video_tokenizer_tpu.ops.quant_matmul import w8_matmul

    M = 16  # decode rows (emit 8 x CFG 2)
    geoms = [
        ("wqkv", 1280, 3840),
        ("wo", 1280, 1280),
        ("w1/w3", 1280, 3456),
        ("w2", 3456, 1280),
        ("head", 1280, 8192),
    ]
    key = jax.random.PRNGKey(0)
    print("== w8_matmul microbench (M=16 decode rows) ==", flush=True)
    total = 0.0
    for name, K, N in geoms:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        s = jnp.ones((N,), jnp.float32)

        # w8 rides in the CARRY: closed-over it becomes an HLO constant,
        # and constant-embedded weights measured up to 3x slower than the
        # argument path the real model takes (wqkv "anomaly", 2026-08-21)
        def step(c):
            c, w8, s = c
            y = w8_matmul(c, w8, s)
            # keep carry shape: fold back to [M, K] cheaply
            c2 = (y[:, :K] if N >= K else
                  jnp.tile(y, (1, (K + N - 1) // N))[:, :K]).astype(c.dtype)
            return (c2, w8, s)

        t = time_scan(step, (x, w8, s), iters=2048)
        gbps = K * N / t / 1e9
        mult = {"wqkv": 30, "wo": 30, "w1/w3": 60, "w2": 30, "head": 1}[name]
        total += t * mult
        print(f"  {name:6s} [{K:5d}x{N:5d}] {t * 1e6:8.2f} us  "
              f"({gbps:6.1f} GB/s int8)  x{mult}/step", flush=True)
        # bf16 dense comparison (weights in the carry, as above)
        wb = w8.astype(jnp.bfloat16)

        def step_b(c):
            c, wb = c
            y = jnp.dot(c, wb, preferred_element_type=jnp.float32)
            c2 = (y[:, :K] if N >= K else
                  jnp.tile(y, (1, (K + N - 1) // N))[:, :K]).astype(c.dtype)
            return (c2, wb)

        tb = time_scan(step_b, (x, wb), iters=2048)
        print(f"        bf16 dense          {tb * 1e6:8.2f} us  "
              f"({2 * K * N / tb / 1e9:6.1f} GB/s bf16)", flush=True)
    print(f"  projection total per decode step: {total * 1e3:.3f} ms "
          f"(30-layer model)", flush=True)


def decode_sweep(int8=True, int8_kv=True, batch=8, sample=True):
    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )
    import numpy as np

    cfg = ModelArgs(
        n_layer=30, n_head=20, dim=1280, vocab_size=8192, num_classes=101,
        max_seq_len=1024, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0, class_dropout_prob=0.0,
    )
    model = LARP_AR(cfg)
    B = batch * 2
    S = 1024 + cfg.cls_token_num
    key = jax.random.PRNGKey(0)
    idx = jnp.zeros((B, 4), jnp.int32)
    cond = jnp.zeros((B,), jnp.int32)
    variables = model.init({"params": key}, idx, cond)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        variables["params"],
    )
    if int8:
        model = LARP_AR(dataclasses.replace(cfg, quantized=True))
        params = quantize_params(params)
    variables = {"params": params}
    cache = model.init_cache(B, S, dtype=jnp.int8 if int8_kv else jnp.bfloat16)
    tok = jnp.zeros((B, 1), jnp.int32)
    K = 64

    @jax.jit
    def scan_steps(variables, cache, tok, pos0):
        def body(carry, i):
            cache, tok = carry
            logits, cache = model.apply(
                variables, tok, pos0 + i, cache, None,
                method=model.decode_step,
            )
            if not sample:
                nxt = jnp.argmax(logits[: B // 2, -1], axis=-1)
            else:
                half = logits[: B // 2, -1].astype(jnp.float32)
                other = logits[B // 2:, -1].astype(jnp.float32)
                mixed = other + 1.5 * (half - other)
                v, _ = jax.lax.top_k(mixed, 100)
                mixed = jnp.where(mixed < v[:, -1:], -jnp.inf, mixed)
                nxt = jax.random.categorical(
                    jax.random.fold_in(jax.random.PRNGKey(1), i), mixed)
            return (cache, jnp.tile(nxt[:, None], (2, 1))), nxt

        (cache, tok), toks = jax.lax.scan(
            body, (cache, tok), jnp.arange(K, dtype=jnp.int32))
        return toks

    def time_at(pos):
        p = jnp.asarray(pos, jnp.int32)
        t = scan_steps(variables, cache, tok, p)
        int(jnp.sum(t))
        t0 = time.perf_counter()
        t = scan_steps(variables, cache, tok, p)
        int(jnp.sum(t))
        return max(time.perf_counter() - t0 - _RTT[0], 0.0) / K

    positions = [64, 512, 1000]
    times = [time_at(p) for p in positions]
    A = np.vstack([np.ones(len(positions)), positions]).T
    (t_fixed, kv_rate), *_ = np.linalg.lstsq(
        A, np.asarray(times), rcond=None)
    tag = f"int8={int8} kv8={int8_kv} b={batch} sample={sample}"
    for p, t in zip(positions, times):
        print(f"  [{tag}] pos {p:5d}: {t * 1e3:7.3f} ms/step "
              f"({batch / t:8.1f} tok/s)", flush=True)
    print(f"  [{tag}] t_fixed={t_fixed * 1e3:.3f} ms  "
          f"kv_rate={kv_rate * 1e6:.3f} us/pos", flush=True)
    return t_fixed, kv_rate


def spec_pieces():
    """Time the speculative loop's two model calls separately."""
    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )

    common = dict(vocab_size=8192, num_classes=101, max_seq_len=1024,
                  token_dropout_p=0.0, resid_dropout_p=0.0,
                  ffn_dropout_p=0.0, class_dropout_prob=0.0)
    B = 16  # 8 emit x CFG
    G = 4
    S = 1024 + 1 + G

    for tag, kw, width in (
        ("draft(60M)", dict(n_layer=8, n_head=12, dim=768), 1),
        ("target(632M)", dict(n_layer=30, n_head=20, dim=1280), G + 1),
    ):
        cfg = ModelArgs(**kw, **common)
        model = LARP_AR(cfg)
        idx = jnp.zeros((B, 4), jnp.int32)
        cond = jnp.zeros((B,), jnp.int32)
        v = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), v["params"])
        model = LARP_AR(dataclasses.replace(cfg, quantized=True))
        params = quantize_params(params)
        v = {"params": params}
        cache = model.apply(v, B, S, jnp.int8, method=model.init_cache)
        toks = jnp.zeros((B, width), jnp.int32)
        pos = jnp.full((B,), 512, jnp.int32)

        # params must be a traced ARGUMENT — closed-over they become HLO
        # constants and the 632M upload blows the remote-compile body limit
        iters = 64

        @jax.jit
        def run(v, cache, toks):
            def body(carry, _):
                cache, toks = carry
                logits, cache = model.apply(
                    v, toks, pos, cache, None, method=model.decode_chunk)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (cache, jnp.tile(nxt[:, None], (1, width))), ()
            (cache, toks), _ = jax.lax.scan(
                body, (cache, toks), None, length=iters)
            return jnp.sum(toks)

        int(run(v, cache, toks))  # compile + warmup
        t0 = time.perf_counter()
        int(run(v, cache, toks))
        t = max(time.perf_counter() - t0 - _RTT[0], 0.0) / iters
        print(f"  {tag:13s} decode_chunk[{width}] : {t * 1e3:7.3f} ms",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-spec", action="store_true")
    ap.add_argument("--skip-tiles", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    measure_rtt()
    if not args.skip_tiles:
        bench_w8_tiles()
    if not args.skip_sweep:
        print("== decode pos-sweep ==", flush=True)
        decode_sweep(int8=True, int8_kv=True, sample=True)
        decode_sweep(int8=True, int8_kv=True, sample=False)
        decode_sweep(int8=True, int8_kv=True, batch=32, sample=True)
    if not args.skip_spec:
        print("== speculative pieces ==", flush=True)
        spec_pieces()


if __name__ == "__main__":
    main()
