"""Benchmark: flagship tokenizer encode+decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Primary metric (BASELINE.json): 16-frame 128x128 clip encode+VQ+decode
throughput, clips/sec/chip, on the LARP-L-long flagship geometry (1024
holistic tokens, d=768, 12+12 layers, VQ-8192). `vs_baseline` is the ratio to
the single-host CPU baseline of the same jitted program measured on this
machine (see CPU_BASELINE_CLIPS_PER_S below; re-measure with --cpu-baseline).
Extras: AR sampling tokens/s (llama-abs-LP-geometry KV-cache decode).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Measured on this container's CPU (one host, same jitted fp32 program,
# batch 1): see `python bench.py --cpu-baseline`.
CPU_BASELINE_CLIPS_PER_S = None  # filled after first CPU measurement below
_CPU_BASELINE_FILE = "cpu_baseline.json"

# v5e chip peaks used to turn measured throughput into utilization numbers.
# (If the driver runs on a different chip generation the ratios shift but the
# analytic FLOP/byte counts stay correct.)
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def tokenizer_flops_per_clip() -> float:
    """Analytic forward FLOPs for one 16x128x128 clip through the flagship
    LARP-L-long geometry (2048 patch + 1024 latent tokens, d=768, 12+12
    layers, VQ-8192). Counts matmul FLOPs (2*M*N*K); elementwise/LN/softmax
    are bandwidth, not FLOPs, and are excluded. This is the arithmetic
    behind the `mfu` field — the round-1 README's '~76% of peak' claim was
    wrong (it divided by fwd-only FLOPs of a smaller sequence)."""
    d = 768
    layers = 24  # 12 encoder + 12 decoder
    s = 3072  # both stacks attend over [2048 patches || 1024 latents]
    per_layer = (
        8 * s * d * d  # q,k,v,o projections: 4 matmuls, 2*s*d*d each
        + 4 * s * s * d  # scores (2*s^2*d) + prob@V (2*s^2*d)
        + 16 * s * d * d  # MLP ratio 4: 2 matmuls, 2*s*d*4d each
    )
    patch = 2 * 2048 * d * (3 * 4 * 8 * 8)  # conv3d patchify as matmul
    unpatch = 2 * 2048 * d * (3 * 4 * 8 * 8)  # output layer
    vq = 2 * 1024 * 8 * 8192  # codebook distance scan (bottleneck_dim 8)
    proj = 2 * 1024 * d * 8 * 2  # bottleneck in/out projections
    return float(layers * per_layer + patch + unpatch + vq + proj)


def ar_decode_bytes_per_token(emit_batch: int, cache_batch: int,
                              avg_pos: float, weight_bytes_per_param: float,
                              cache_bytes_per_elem: float = 2.0) -> float:
    """HBM bytes streamed per EMITTED token on the 632M llama-abs-LP
    geometry: every step re-reads all projection weights plus the live
    prefix of every layer's K+V cache. cache_batch > emit_batch under CFG
    (batch doubling). The decode loop is bandwidth-bound, so
    tokens/s * bytes/token ~= achieved HBM GB/s."""
    # NOTE: this llama-abs-LP geometry is mirrored in tools/profile_decode.py
    # — keep the two in sync when changing the serving model
    n_layer, dim, vocab = 30, 1280, 8192
    hidden = 3456  # SwiGLU 2/3*4d rounded to multiple of 256
    proj_params = n_layer * (
        3 * dim * dim  # wqkv (MHA: q + k + v)
        + dim * dim  # wo
        + 3 * dim * hidden  # w1, w2, w3
    ) + dim * vocab  # output head
    weight_traffic = proj_params * weight_bytes_per_param
    kv_traffic = (
        cache_batch * n_layer * 2 * avg_pos * dim * cache_bytes_per_elem
    )
    return (weight_traffic + kv_traffic) / emit_batch


def bench_tokenizer(batch_size: int = 8, iters: int = 20, dtype=jnp.bfloat16):
    # NOTE: on the axon TPU tunnel, block_until_ready returns before the
    # computation finishes; we chain `iters` forwards inside one jitted
    # lax.scan (each feeding the next) and fetch one scalar to the host,
    # so the measured wall time is real end-to-end device time.
    from __graft_entry__ import flagship_tokenizer

    model = flagship_tokenizer(dtype=dtype)
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (batch_size, 3, 16, 128, 128), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
        x[:1], train=False,
    )
    # the flagship output layer is zero-init; randomize it so every chained
    # forward sees a distinct, input-dependent tensor
    variables = jax.tree_util.tree_map(
        lambda p: p
        if p.ndim < 2
        else p + 0.02 * jax.random.normal(jax.random.PRNGKey(9), p.shape, p.dtype),
        variables,
    )

    def chained(variables, x, n):
        def body(carry, _):
            out = model.apply(
                variables, carry, train=False, rngs={"vq": jax.random.PRNGKey(3)}
            )
            nxt = jnp.clip(out["pred_frames"].astype(x.dtype), 0.0, 1.0)
            return nxt, out["bottleneck_rep"][0, 0]
        final, reps = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(final[0, 0, 0, 0]) + jnp.sum(reps)

    fn = jax.jit(chained, static_argnames=("n",))
    float(fn(variables, x, iters))  # compile + warmup (same n as timed run)
    t0 = time.perf_counter()
    float(fn(variables, x, iters))  # host fetch forces completion
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def bench_ar_sampling(batch_size: int = 8, new_tokens: int = 1024,
                      int8: bool = False, int8_kv: bool = False,
                      n_kv_head=None):
    """KV-cache decode throughput on the 632M llama-abs-LP geometry, at the
    flagship workload (1024 codes/video, scripts/train_larp_ar_reproduce.sh).
    int8=True measures the weight-only-quantized serving mode
    (sample.py --dtype int8); int8_kv=True additionally quantizes the KV
    cache per row (halves the cache traffic vs bf16)."""
    import dataclasses

    from video_tokenizer_tpu.models.larp_ar import (
        LARP_AR, ModelArgs, quantize_params,
    )
    from video_tokenizer_tpu.generation import generate

    cfg = ModelArgs(
        n_layer=30, n_head=20, dim=1280, vocab_size=8192, num_classes=101,
        max_seq_len=1024, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0, n_kv_head=n_kv_head,
    )
    model = LARP_AR(cfg)
    cond = jnp.zeros((batch_size,), jnp.int32)
    idx = jnp.zeros((batch_size, 8), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    variables = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), variables
    )
    if int8:
        model = LARP_AR(dataclasses.replace(cfg, quantized=True))
        variables = {"params": quantize_params(variables["params"])}
    cache_dtype = jnp.int8 if int8_kv else None

    key = jax.random.PRNGKey(1)
    seq = generate(model, variables, cond, new_tokens, key, cfg_scale=1.5,
                   top_k=100, cache_dtype=cache_dtype)
    int(seq.sum())  # force completion (block_until_ready is unreliable here)
    t0 = time.perf_counter()
    seq = generate(model, variables, cond, new_tokens, jax.random.PRNGKey(2),
                   cfg_scale=1.5, top_k=100, cache_dtype=cache_dtype)
    int(seq.sum())
    dt = time.perf_counter() - t0
    return batch_size * new_tokens / dt


def bench_speculative(batch_size: int = 8, new_tokens: int = 1024,
                      gamma: int = 4, int8_kv: bool = False,
                      target_kw: dict = None, draft_kw: dict = None):
    """Speculative-decoding serving throughput (sample.py --draft_model):
    632M llama-abs-LP target, ~60M draft (8 layers, d=768), gamma proposals
    per ONE target chunk verify. Both models keep their ZERO-INIT output
    heads, so target and draft distributions are both exactly uniform and
    the acceptance rate is ~1.0 — i.e. this measures the mechanical ceiling
    of the draft-scan + chunk-verify machinery at the real compute costs of
    both models (a trained draft lands below the ceiling in proportion to
    its real acceptance rate, which bench weights cannot have). Returns
    (tokens/s, acceptance_rate)."""
    from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
    from video_tokenizer_tpu.generation import speculative_generate

    common = dict(vocab_size=8192, num_classes=101, max_seq_len=1024,
                  token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0)
    # target_kw/draft_kw override the geometry (tests run a tiny pair on CPU
    # to keep this driver-run path from bitrotting between TPU sessions)
    common.update(target_kw or {})
    t_args = {"n_layer": 30, "n_head": 20, "dim": 1280, **common}
    d_args = {**t_args, "n_layer": 8, "n_head": 12, "dim": 768,
              **(draft_kw or {})}
    target = LARP_AR(ModelArgs(**t_args))
    draft = LARP_AR(ModelArgs(**d_args))
    cond = jnp.zeros((batch_size,), jnp.int32)
    idx = jnp.zeros((batch_size, 8), jnp.int32)

    def init(m):
        v = m.init({"params": jax.random.PRNGKey(0)}, idx, cond)
        return jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), v)

    tv, dv = init(target), init(draft)
    cache_dtype = jnp.int8 if int8_kv else None
    kw = dict(gamma=gamma, cfg_scale=1.5, top_k=100, cache_dtype=cache_dtype,
              draft_cache_dtype=cache_dtype, return_stats=True)
    seq, stats = speculative_generate(target, tv, draft, dv, cond, new_tokens,
                                      jax.random.PRNGKey(1), **kw)
    int(seq.sum())  # force completion
    t0 = time.perf_counter()
    seq, stats = speculative_generate(target, tv, draft, dv, cond, new_tokens,
                                      jax.random.PRNGKey(2), **kw)
    int(seq.sum())
    dt = time.perf_counter() - t0
    return batch_size * new_tokens / dt, float(stats["acceptance_rate"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-baseline", action="store_true",
                    help="measure the CPU baseline and store it")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-ar", action="store_true")
    args = ap.parse_args()

    import os

    if args.cpu_baseline:
        jax.config.update("jax_platforms", "cpu")
        clips_s = bench_tokenizer(batch_size=1, iters=2, dtype=jnp.float32)
        with open(_CPU_BASELINE_FILE, "w") as f:
            json.dump({"clips_per_s": clips_s}, f)
        print(json.dumps({"metric": "cpu_baseline_encode_decode",
                          "value": round(clips_s, 4), "unit": "clips/s"}))
        return

    baseline = None
    if os.path.exists(_CPU_BASELINE_FILE):
        with open(_CPU_BASELINE_FILE) as f:
            baseline = json.load(f)["clips_per_s"]

    # The axon tunnel has outage modes where backend init HANGS forever
    # (jax.devices() never returns). A hung bench wedges the driver; a
    # bounded failure with a parseable JSON line does not.
    import threading

    def _probe_timed_out():
        print(json.dumps({
            "metric": "tokenizer_encode_decode_throughput",
            "value": 0.0, "unit": "clips/s/chip", "vs_baseline": None,
            "error": "device probe timed out after 180s (axon tunnel outage)",
        }), flush=True)
        os._exit(3)

    watchdog = threading.Timer(180.0, _probe_timed_out)
    watchdog.daemon = True
    watchdog.start()
    n_dev = len(jax.devices())  # may hang on a dead tunnel
    watchdog.cancel()
    assert n_dev >= 1

    clips_s = bench_tokenizer(batch_size=args.batch_size, iters=args.iters)
    flops_clip = tokenizer_flops_per_clip()
    achieved_tflops = clips_s * flops_clip / 1e12
    extras = {
        "tflops_per_clip": round(flops_clip / 1e12, 3),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_vs_v5e_peak": round(achieved_tflops / V5E_BF16_TFLOPS, 3),
    }
    if not args.skip_ar:
        # bench geometry: emit batch 8, cfg_scale 1.5 doubles cache rows to
        # 16; avg live prefix over 1024 steps ~= 512
        def hbm_util(tok_s, wbytes):
            bpt = ar_decode_bytes_per_token(8, 16, 512.0, wbytes)
            return round(tok_s * bpt / 1e9, 1)

        try:
            tok_s = bench_ar_sampling()
            extras["ar_tokens_per_s"] = round(tok_s, 1)
            extras["ar_hbm_gbps"] = hbm_util(tok_s, 2.0)
            tok_s8 = bench_ar_sampling(int8=True)
            extras["ar_tokens_per_s_int8"] = round(tok_s8, 1)
            extras["ar_hbm_gbps_int8"] = hbm_util(tok_s8, 1.0)
            tok_s8kv = bench_ar_sampling(int8=True, int8_kv=True)
            extras["ar_tokens_per_s_int8_kv"] = round(tok_s8kv, 1)
            extras["ar_hbm_gbps_int8_kv"] = round(
                tok_s8kv * ar_decode_bytes_per_token(
                    8, 16, 512.0, 1.0, cache_bytes_per_elem=1.0
                ) / 1e9, 1,
            )
        except Exception as e:
            extras["ar_tokens_per_s_error"] = str(e)
        try:
            # batch-scaled serving: b=32 amortizes the per-step weight read
            # over 4x the emitted tokens (sample.py --batch_size 32)
            tok_s8kv32 = bench_ar_sampling(batch_size=32, int8=True,
                                           int8_kv=True)
            extras["ar_tokens_per_s_int8_kv_b32"] = round(tok_s8kv32, 1)
            extras["ar_hbm_gbps_int8_kv_b32"] = round(
                tok_s8kv32 * ar_decode_bytes_per_token(
                    32, 64, 512.0, 1.0, cache_bytes_per_elem=1.0
                ) / 1e9, 1,
            )
        except Exception as e:
            extras["ar_b32_error"] = str(e)
        try:
            # speculative ceiling: ~60M draft + ONE chunk verify per gamma=4
            # proposals; acceptance ~1.0 by construction (uniform heads)
            tok_spec, acc = bench_speculative(int8_kv=True)
            extras["ar_tokens_per_s_spec_int8_kv"] = round(tok_spec, 1)
            extras["spec_acceptance"] = round(acc, 3)
        except Exception as e:
            extras["ar_spec_error"] = str(e)
        try:
            # GQA zoo geometry (n_kv_head = n_head/4): the flash-decode
            # kernel's grouped-KV path, which also cuts cache traffic 4x
            tok_gqa = bench_ar_sampling(n_kv_head=5)
            extras["ar_tokens_per_s_gqa4"] = round(tok_gqa, 1)
        except Exception as e:
            extras["ar_gqa_error"] = str(e)

    print(json.dumps({
        "metric": "tokenizer_encode_decode_throughput",
        "value": round(clips_s, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_s / baseline, 2) if baseline else None,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
