"""Sweep block_n (and block_m) for the w8_matmul Pallas kernel at the
decode-step geometries on a real TPU. Diagnoses the wqkv [1280x3840]
anomaly found by tools/profile_serving_r4.py (198 GB/s with block_n=768
while every sibling projection streams 550-745 GB/s).

Run:  python tools/sweep_w8_tiles.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video_tokenizer_tpu.ops.quant_matmul import _w8_matmul_2d  # noqa: E402

_RTT = [0.0]


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    _RTT[0] = min(ts)
    print(f"RTT floor: {_RTT[0] * 1e3:.2f} ms", flush=True)


def time_tile(M, K, N, block_m, block_n, iters=2048):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    s = jnp.ones((N,), jnp.float32)

    @jax.jit
    def run(x, w8, s):
        def body(c, _):
            y = _w8_matmul_2d(c, w8, s, block_m, block_n, c.dtype)
            c2 = (y[:, :K] if N >= K else
                  jnp.tile(y, (1, (K + N - 1) // N))[:, :K]).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.float32(c[0, 0])

    float(run(x, w8, s))
    best = float("inf")
    for _ in range(3):  # min-of-3: the tunnel RTT has ±20 ms outliers
        t0 = time.perf_counter()
        float(run(x, w8, s))
        best = min(best, time.perf_counter() - t0)
    return max(best - _RTT[0], 1e-9) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    measure_rtt()
    M = 16
    for K, N in ((1280, 3840), (1280, 3456), (1280, 1280)):
        print(f"== [{K}x{N}] M={M} ==", flush=True)
        for bn in (128, 256, 384, 640, 768, 1152, 1280, 1920, 3840):
            if N % bn:
                continue
            t = time_tile(M, K, N, 16, bn)
            print(f"  block_n {bn:5d} (grid {N // bn:2d}): {t * 1e6:8.2f} us"
                  f"  ({K * N / t / 1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
