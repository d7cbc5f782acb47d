"""Capture a device trace of the int8+int8KV decode step and print the
per-op self-time breakdown (VERDICT r3 #4: attribute the b32 gap).

Traces `iters` decode steps inside one jitted scan at a fixed position,
then parses the xplane with xprof's op-profile converter and prints the
top ops by device self time.

Run:  python tools/trace_decode.py [--batch 32] [--pos 512]
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(batch, int8=True, int8_kv=True, iters=64, pos_v=512, sample=True):
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
    if int8:
        model = LARP_AR(dataclasses.replace(cfg, quantized=True))
        params = quantize_params(params)
    v = {"params": params}
    cache = model.init_cache(B, S, dtype=jnp.int8 if int8_kv else jnp.bfloat16)
    tok = jnp.zeros((B, 1), jnp.int32)
    pos = jnp.int32(pos_v)

    @jax.jit
    def run(v, cache, tok):
        def body(carry, i):
            cache, tok = carry
            logits, cache = model.apply(
                v, tok, pos, cache, None, method=model.decode_step)
            if sample:
                half = logits[: B // 2, -1].astype(jnp.float32)
                other = logits[B // 2:, -1].astype(jnp.float32)
                mixed = other + 1.5 * (half - other)
                vv, _ = jax.lax.top_k(mixed, 100)
                mixed = jnp.where(mixed < vv[:, -1:], -jnp.inf, mixed)
                nxt = jax.random.categorical(
                    jax.random.fold_in(jax.random.PRNGKey(1), i), mixed
                ).astype(jnp.int32)
            else:
                nxt = jnp.argmax(logits[: B // 2, -1], axis=-1).astype(
                    jnp.int32)
            return (cache, jnp.tile(nxt[:, None], (2, 1))), ()
        (cache, tok), _ = jax.lax.scan(
            body, (cache, tok), jnp.arange(iters, dtype=jnp.int32))
        return jnp.sum(tok)

    return run, (v, cache, tok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pos", type=int, default=512)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--out", default="/tmp/decode_trace")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    run, operands = build(args.batch, iters=args.iters, pos_v=args.pos)
    int(run(*operands))  # compile + warmup
    t0 = time.perf_counter()
    int(run(*operands))
    dt = time.perf_counter() - t0
    print(f"b={args.batch} pos={args.pos}: {dt / args.iters * 1e3:.3f} "
          f"ms/step (incl ~25 ms RTT / {args.iters})", flush=True)

    with jax.profiler.trace(args.out):
        int(run(*operands))
    print("trace captured", flush=True)

    # ---- parse the chrome-trace export: device "XLA Ops" lane, self time
    # via an interval stack (the tensorboard plugin's native xplane
    # converter is incompatible with this image's TF build)
    import collections
    import gzip

    traces = sorted(glob.glob(
        args.out + "/plugins/profile/*/*.trace.json.gz"))
    assert traces, f"no trace under {args.out}"
    tr = json.load(gzip.open(traces[-1]))
    evs = tr["traceEvents"]
    lane = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane[(e["pid"], e.get("tid"))] = e["args"]["name"]
    ops = [e for e in evs if e.get("ph") == "X"
           and lane.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack, self_us, byid = [], collections.Counter(), {}
    for e in ops:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][1] - 1e-9:
            stack.pop()
        if stack:
            self_us[id(stack[-1][2])] -= dur
        self_us[id(e)] += dur
        byid[id(e)] = e
        stack.append((ts, ts + dur, e))
    by_name = collections.Counter()
    cat_of, long_of = {}, {}
    for k, us in self_us.items():
        e = byid[k]
        by_name[e["name"]] += us
        cat_of[e["name"]] = e.get("args", {}).get("hlo_category", "?")
        long_of[e["name"]] = e.get("args", {}).get("long_name", "")
    total = sum(by_name.values())
    print(f"== self time by op over {args.iters} steps "
          f"(total {total / 1e3:.2f} ms, {total / args.iters:.0f} us/step) ==")
    for name, us in by_name.most_common(30):
        print(f"  {us / total * 100:5.1f}%  {us / args.iters:7.1f} us/step  "
              f"[{cat_of[name]}] {name[:60]}")
        if us / total > 0.04:
            print(f"          {long_of[name][:180]}")


if __name__ == "__main__":
    main()
