"""Attribute the speculative chunk-verify cost (VERDICT r4 work).

tools/profile_serving_r4.py measured target decode_chunk[5] at 9.33 ms vs
2.88 ms for a plain decode_step at the same pos — the Pallas chunk kernel's
per-g unrolled VPU broadcast work scales the block body by G. This script
races the Pallas chunk kernel against the XLA chunk path and isolates the
G-scaling, at the bench serving geometry (int8 weights + int8 KV, B=16).

Run:  python tools/profile_chunk_r4.py
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


def bench_model(tag, kw, width, iters, use_xla_chunk=False,
                use_decode_step=False):
    import video_tokenizer_tpu.ops.decode_attention as da
    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )

    common = dict(vocab_size=8192, num_classes=101, max_seq_len=1024,
                  token_dropout_p=0.0, resid_dropout_p=0.0,
                  ffn_dropout_p=0.0, class_dropout_prob=0.0)
    B = 16
    G = 4
    S = 1024 + 1 + G
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

    orig_chunk = da.chunk_attention
    if use_xla_chunk:
        def chunk_xla(q, k_cache, v_cache, p, **kwargs):
            kwargs.pop("block_s", None)
            kwargs.pop("batch_chunk", None)
            kwargs.pop("use_pallas", None)
            return da.xla_chunk_attention(q, k_cache, v_cache, p, **kwargs)
        da.chunk_attention = chunk_xla
    try:
        @jax.jit
        def run(v, cache, toks):
            def body(carry, _):
                cache, toks = carry
                if use_decode_step:
                    logits, cache = model.apply(
                        v, toks, pos[0], cache, None,
                        method=model.decode_step)
                else:
                    logits, cache = model.apply(
                        v, toks, pos, cache, None, method=model.decode_chunk)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (cache, jnp.tile(nxt[:, None], (1, width))), ()
            (cache, toks), _ = jax.lax.scan(
                body, (cache, toks), None, length=iters)
            return jnp.sum(toks)

        int(run(v, cache, toks))
        t0 = time.perf_counter()
        int(run(v, cache, toks))
        t = max(time.perf_counter() - t0 - _RTT[0], 0.0) / iters
    finally:
        da.chunk_attention = orig_chunk
    print(f"  {tag:34s}: {t * 1e3:7.3f} ms", flush=True)
    return t


def bench_decode_route(tag, batch, bc, bs, iters=64, pos_v=512):
    """Plain decode_step with the single-token attention routed through the
    block-diagonal MXU chunk kernel (G=1) at an explicit (batch_chunk,
    block_s) — the candidate replacement for _decode_kernel (fewer, larger
    grid programs at big batch; bf16 temps instead of fp32)."""
    import video_tokenizer_tpu.models.larp_ar as la
    import video_tokenizer_tpu.ops.decode_attention as da
    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )

    cfg = ModelArgs(n_layer=30, n_head=20, dim=1280, vocab_size=8192,
                    num_classes=101, max_seq_len=1024, token_dropout_p=0.0,
                    resid_dropout_p=0.0, ffn_dropout_p=0.0,
                    class_dropout_prob=0.0)
    model = LARP_AR(cfg)
    B = batch * 2
    S = 1024 + cfg.cls_token_num
    idx = jnp.zeros((B, 4), jnp.int32)
    cond = jnp.zeros((B,), jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), v["params"])
    model = LARP_AR(dataclasses.replace(cfg, quantized=True))
    params = quantize_params(params)
    v = {"params": params}
    cache = model.init_cache(B, S, dtype=jnp.int8)
    tok = jnp.zeros((B, 1), jnp.int32)
    pos = jnp.int32(pos_v)

    orig = la.decode_attention

    def routed(q, k_cache, v_cache, p, key_valid=None, **kw):
        if bc is None:
            return orig(q, k_cache, v_cache, p, key_valid=key_valid, **kw)
        posv = jnp.broadcast_to(jnp.asarray(p, jnp.int32), (q.shape[0],))
        out = da.chunk_attention(
            q[:, None], k_cache, v_cache, posv, key_valid=key_valid,
            batch_chunk=bc, block_s=bs, **kw)
        return out[:, 0]

    la.decode_attention = routed
    try:
        @jax.jit
        def run(v, cache, tok):
            def body(carry, _):
                cache, tok = carry
                logits, cache = model.apply(
                    v, tok, pos, cache, None, method=model.decode_step)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (cache, nxt[:, None]), ()
            (cache, tok), _ = jax.lax.scan(
                body, (cache, tok), None, length=iters)
            return jnp.sum(tok)

        int(run(v, cache, tok))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(run(v, cache, tok))
            best = min(best, time.perf_counter() - t0)
        t = max(best - _RTT[0], 0.0) / iters
    except Exception as e:
        print(f"  {tag:34s}: FAILED {str(e)[:120]}", flush=True)
        return
    finally:
        la.decode_attention = orig
    print(f"  {tag:34s}: {t * 1e3:7.3f} ms ({batch / t:7.1f} tok/s)",
          flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--route-only", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    measure_rtt()
    if not args.route_only:
        draft = dict(n_layer=8, n_head=12, dim=768)
        target = dict(n_layer=30, n_head=20, dim=1280)
        bench_model("draft  chunk[1] pallas", draft, 1, 256)
        bench_model("draft  chunk[1] xla", draft, 1, 256, use_xla_chunk=True)
        bench_model("draft  step (plain path)", draft, 1, 256,
                    use_decode_step=True)
        bench_model("target chunk[5] pallas", target, 5, 64)
        bench_model("target chunk[5] xla", target, 5, 64, use_xla_chunk=True)
        bench_model("target chunk[1] pallas", target, 1, 64)
        bench_model("target step (plain path)", target, 1, 64,
                    use_decode_step=True)
    # decode-kernel replacement candidates (None = current _decode_kernel)
    bench_decode_route("b8  decode current", 8, None, None)
    bench_decode_route("b8  chunk bc16 bs288", 8, 16, 288)
    bench_decode_route("b8  chunk bc16 bs384", 8, 16, 384)
    bench_decode_route("b32 decode current", 32, None, None)
    bench_decode_route("b32 chunk bc16 bs288", 32, 16, 288)
    bench_decode_route("b32 chunk bc32 bs192", 32, 32, 192)
    bench_decode_route("b32 chunk bc64 bs96", 32, 64, 96)


if __name__ == "__main__":
    main()
