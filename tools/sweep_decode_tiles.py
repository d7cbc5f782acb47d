"""Sweep (batch_chunk, block_s) for the Pallas decode-attention kernel on a
real TPU: parity vs the XLA fallback, then per-call latency at the flagship
serving geometry. Picks the kernel tile heuristics in ops/decode_attention.py.

Run:  python tools/sweep_decode_tiles.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from video_tokenizer_tpu.ops.decode_attention import (
    _quantize_rows,
    decode_attention,
    xla_decode_attention,
)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    S, KV, D = 1152, 1280, 64  # llama-abs-LP: 20 heads x 64, 1025 -> 128x9
    H = KV // D
    pos = jnp.int32(1000)
    for B in (16, 64, 128):
        for quant in (False, True):
            key = jax.random.PRNGKey(B)
            kq, kk, kv2 = jax.random.split(key, 3)
            q = jax.random.normal(kq, (B, H, D), jnp.bfloat16)
            kf = jax.random.normal(kk, (B, S, KV), jnp.bfloat16)
            vf = jax.random.normal(kv2, (B, S, KV), jnp.bfloat16)
            if quant:
                k8, ks = _quantize_rows(kf)
                v8, vs = _quantize_rows(vf)
                ksp = jnp.zeros((S, 128)).at[:, :B].set(ks.T)
                vsp = jnp.zeros((S, 128)).at[:, :B].set(vs.T)
                kc, vc, scales = k8, v8, dict(k_scale=ksp, v_scale=vsp)
            else:
                kc, vc, scales = kf, vf, {}
            ref = np.asarray(
                jax.jit(xla_decode_attention, static_argnames=())(
                    q, kc, vc, pos, **scales
                ),
                np.float32,
            )
            t_xla = bench(
                jax.jit(lambda q, k, v: xla_decode_attention(
                    q, k, v, pos, **scales)), q, kc, vc,
            )
            print(f"B={B:4d} int8={quant}  XLA fallback: {t_xla*1e6:8.1f} us")
            for bc in (8, 16):
                if B % bc:
                    continue
                for bs in (32, 64, 128):
                    if S % bs:
                        continue
                    try:
                        fn = jax.jit(lambda q, k, v, bc=bc, bs=bs:
                                     decode_attention(
                                         q, k, v, pos, use_pallas=True,
                                         block_s=bs, batch_chunk=bc,
                                         **scales))
                        got = np.asarray(fn(q, kc, vc), np.float32)
                        rel = float(
                            np.max(np.abs(got - ref))
                            / (np.max(np.abs(ref)) + 1e-6)
                        )
                        t = bench(fn, q, kc, vc)
                        gb = B * (pos + 1) * KV * 2 * (1 if quant else 2) / 1e9
                        print(f"  bc={bc:3d} block_s={bs:4d}: "
                              f"{t*1e6:8.1f} us  rel={rel:.2e}  "
                              f"{float(gb)/t:6.0f} GB/s")
                    except Exception as e:  # noqa: BLE001
                        msg = str(e).split(chr(10))[0][:100]
                        print(f"  bc={bc:3d} block_s={bs:4d}: FAIL {msg}")


if __name__ == "__main__":
    main()
