"""Attribute AR decode step time: weights vs KV-cache reads vs sampling.

VERDICT r1 asked for the serving bottleneck accounting to be written down.
Method: the per-token decode step streams (a) every projection weight and
(b) the live [0, pos) prefix of every layer's K+V cache. Timing the SAME
jitted step at several fixed positions gives a linear model

    t(pos) = t_fixed + pos * kv_rate

where `kv_rate` is the per-position cache-read cost and `t_fixed` bundles
weight streaming + sampling + dispatch. Comparing both to the analytic
HBM-bytes at the chip's peak bandwidth shows where the headroom is.

Run on the TPU:  python tools/profile_decode.py [--int8] [--int8-kv]
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
import numpy as np

V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true", help="int8 weights")
    ap.add_argument("--int8-kv", action="store_true", help="int8 KV cache")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--no-sample", action="store_true",
                    help="replace CFG+top-k sampling with argmax (isolates "
                         "the sampling cost inside the fixed per-step time)")
    ap.add_argument("--kv-heads", type=int, default=None,
                    help="GQA: n_kv_head (default MHA = n_head)")
    ap.add_argument("--block-s", type=int, default=None,
                    help="override the decode kernel's S block size")
    ap.add_argument("--batch-chunk", type=int, default=None,
                    help="override the decode kernel's per-program batch rows")
    args = ap.parse_args()

    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )

    if args.block_s or args.batch_chunk:
        import functools

        import video_tokenizer_tpu.models.larp_ar as L

        L.decode_attention = functools.partial(
            L.decode_attention, block_s=args.block_s,
            batch_chunk=args.batch_chunk,
        )

    # llama-abs-LP geometry, same as bench.py's serving workload
    cfg = ModelArgs(
        n_layer=30, n_head=20, dim=1280, vocab_size=8192, num_classes=101,
        max_seq_len=1024, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0, class_dropout_prob=0.0,
        n_kv_head=args.kv_heads,
    )
    model = LARP_AR(cfg)
    B = args.batch * 2  # CFG doubles the decode batch
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
    if args.int8:
        model = LARP_AR(dataclasses.replace(cfg, quantized=True))
        params = quantize_params(params)
    variables = {"params": params}

    cache_dtype = jnp.int8 if args.int8_kv else jnp.bfloat16
    cache = model.init_cache(B, S, dtype=cache_dtype)
    tok = jnp.zeros((B, 1), jnp.int32)

    K = args.iters  # steps fused into one scan: measures pure device time
    # (a python-loop-of-steps would pay ~5 ms of axon-tunnel dispatch RTT
    # per step and swamp the signal; generate() is one scan anyway)

    @jax.jit
    def scan_steps(variables, cache, tok, pos0):
        def body(carry, i):
            cache, tok = carry
            logits, cache = model.apply(
                variables, tok, pos0 + i, cache, None,
                method=model.decode_step,
            )
            if args.no_sample:
                nxt = jnp.argmax(logits[: B // 2, -1], axis=-1)
            else:
                # match generate(): CFG combine + top-k sampling per step
                half = logits[: B // 2, -1].astype(jnp.float32)
                other = logits[B // 2 :, -1].astype(jnp.float32)
                mixed = other + 1.5 * (half - other)
                v, _ = jax.lax.top_k(mixed, 100)
                mixed = jnp.where(mixed < v[:, -1:], -jnp.inf, mixed)
                nxt = jax.random.categorical(jax.random.fold_in(
                    jax.random.PRNGKey(1), i), mixed)
            return (cache, jnp.tile(nxt[:, None], (2, 1))), nxt

        (cache, tok), toks = jax.lax.scan(
            body, (cache, tok), jnp.arange(K, dtype=jnp.int32)
        )
        return toks

    def time_at(pos):
        p = jnp.asarray(pos, jnp.int32)
        t = scan_steps(variables, cache, tok, p)
        int(jnp.sum(t))  # force completion through the tunnel
        t0 = time.perf_counter()
        t = scan_steps(variables, cache, tok, p)
        int(jnp.sum(t))
        return (time.perf_counter() - t0) / K

    positions = [64, 256, 512, 768, 1000]
    times = [time_at(p) for p in positions]
    for p, t in zip(positions, times):
        print(f"pos {p:5d}: {t * 1e3:7.3f} ms/step "
              f"({args.batch / t:8.1f} tok/s emitted)")

    # linear fit t = t_fixed + pos * kv_rate
    A = np.vstack([np.ones(len(positions)), positions]).T
    (t_fixed, kv_rate), *_ = np.linalg.lstsq(A, np.asarray(times),
                                             rcond=None)
    n_layer, dim = cfg.n_layer, cfg.dim
    wbytes = 1 if args.int8 else 2
    cbytes = 1 if args.int8_kv else 2
    hd = dim // cfg.n_head
    nkv = cfg.n_kv_head or cfg.n_head
    qkv_out = (cfg.n_head + 2 * nkv) * hd
    proj_params = n_layer * (dim * qkv_out + dim * dim + 3 * dim * 3456) \
        + dim * cfg.vocab_size
    weight_gb = proj_params * wbytes / 1e9
    kv_gb_per_pos = B * n_layer * 2 * nkv * hd * cbytes / 1e9

    print(f"\nfit: t_fixed = {t_fixed * 1e3:.3f} ms, "
          f"kv_rate = {kv_rate * 1e6:.3f} us/pos")
    print(f"analytic weight bytes/step: {weight_gb:.3f} GB -> "
          f"{weight_gb / V5E_HBM_GBPS * 1e3:.3f} ms at peak HBM; measured "
          f"fixed cost {t_fixed * 1e3:.3f} ms "
          f"({weight_gb / t_fixed:.0f} GB/s effective)")
    print(f"analytic KV bytes/pos: {kv_gb_per_pos * 1e6:.1f} KB -> "
          f"{kv_gb_per_pos / V5E_HBM_GBPS * 1e6:.3f} us at peak HBM; "
          f"measured {kv_rate * 1e6:.3f} us "
          f"({kv_gb_per_pos / kv_rate:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
