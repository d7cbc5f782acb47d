"""TPU-side parity check for the Pallas flash-attention kernels.

CI runs on CPU (where `attention` falls back to XLA), so the Pallas
fwd/bwd numerics can only be verified on real hardware. Run this on a TPU
host after touching ops/attention.py:

    python tools/check_attention_tpu.py

Checks, for causal x segment-ids x GQA-shape combinations:
  * forward vs xla_attention (bf16 tolerance)
  * gradients dq/dk/dv vs XLA gradients
  * attention_with_lse causal_offset consistency (ring-attention building
    block): offset-full + offset-diag merge == single-call full attention.
  * decode_attention (single-token KV-cache kernel, ops/decode_attention.py)
    vs its XLA fallback across cache sizes, positions, and key_valid masks.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from video_tokenizer_tpu.ops.attention import (
    attention,
    attention_with_lse,
    xla_attention,
)
from video_tokenizer_tpu.ops.decode_attention import (
    decode_attention,
    xla_decode_attention,
)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6))


def check(name, got, want, tol):
    r = _rel(got, want)
    status = "OK " if r <= tol else "FAIL"
    print(f"[{status}] {name}: rel={r:.2e} (tol {tol})")
    return r <= tol


def main():
    ok = True
    key = jax.random.PRNGKey(0)
    for causal in (False, True):
        for with_segs in (False, True):
            # kv_rep > 1 exercises the GQA h//rep K/V index maps + the
            # group-summed dk/dv; S=640 also exercises _pick_block's
            # divisor rule (640 = 5*128 is not a multiple of block 256)
            for kv_rep in (1, 2):
                B, S, H, D = 2, 640, 4, 64
                Hkv = H // kv_rep
                kq, kk, kv = jax.random.split(key, 3)
                q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
                k = jax.random.normal(kk, (B, S, Hkv, D), jnp.bfloat16)
                v = jax.random.normal(kv, (B, S, Hkv, D), jnp.bfloat16)
                segs = None
                if with_segs:
                    segs = jnp.where(
                        jnp.arange(S)[None, :] < S // 2, 0, 1
                    ).astype(jnp.int32).repeat(B, 0).reshape(B, S)

                f_pl = lambda q, k, v: attention(
                    q, k, v, causal=causal, segment_ids=segs,
                    block_q=256, block_k=256, use_pallas=True,
                ).astype(jnp.float32).sum()
                f_xla = lambda q, k, v: xla_attention(
                    q, k, v, causal=causal, segment_ids=segs
                ).astype(jnp.float32).sum()

                tag = f"causal={causal} segs={with_segs} rep={kv_rep}"
                out_pl = attention(q, k, v, causal=causal, segment_ids=segs,
                                   block_q=256, block_k=256, use_pallas=True)
                out_x = xla_attention(q, k, v, causal=causal, segment_ids=segs)
                ok &= check(f"fwd {tag}", out_pl, out_x, 2e-2)

                g_pl = jax.jit(jax.grad(f_pl, argnums=(0, 1, 2)))(q, k, v)
                g_x = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2)))(q, k, v)
                for nm, a, b in zip("dq dk dv".split(), g_pl, g_x):
                    ok &= check(f"{nm}  {tag}", a, b, 5e-2)

    # causal_offset / LSE merge (the ring-attention contract)
    B, S, H, D = 2, 512, 4, 64
    q = jax.random.normal(jax.random.PRNGKey(7), (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(8), (B, 2 * S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(9), (B, 2 * S, H, D), jnp.bfloat16)
    # full causal attention where q is the SECOND half of a 2S sequence
    full = xla_attention(
        jnp.concatenate([jnp.zeros_like(q), q], 1), k, v, causal=True
    )[:, S:]
    o1, l1 = attention_with_lse(q, k[:, :S], v[:, :S], causal=False,
                                use_pallas=True)
    o2, l2 = attention_with_lse(q, k[:, S:], v[:, S:], causal=True,
                                causal_offset=0, use_pallas=True)
    m = jnp.maximum(l1, l2)
    w1, w2 = jnp.exp(l1 - m), jnp.exp(l2 - m)
    merged = (
        o1.astype(jnp.float32) * jnp.swapaxes(w1, 1, 2)[..., None]
        + o2.astype(jnp.float32) * jnp.swapaxes(w2, 1, 2)[..., None]
    ) / jnp.swapaxes(w1 + w2, 1, 2)[..., None]
    ok &= check("lse-merge ring contract", merged, full, 2e-2)

    # decode kernel (single-token KV-cache attention) vs its XLA fallback,
    # across MHA/GQA, cache sizes, positions, and key_valid masking
    rng = np.random.RandomState(0)
    for (B, S, Hkv, rep, D) in [
        (2, 128, 4, 1, 64), (3, 384, 4, 5, 64),
        (16, 1152, 20, 1, 64), (2, 256, 2, 2, 128),
    ]:
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, H, D), jnp.bfloat16)
        kc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.bfloat16)
        vc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.bfloat16)
        for pos in (0, 127, S // 2, S - 1):
            for with_valid in (False, True):
                kv_mask = None
                if with_valid:
                    kv_mask = jnp.asarray(rng.rand(B, S) > 0.3)
                    kv_mask = kv_mask.at[:, pos].set(True)
                got = decode_attention(q, kc, vc, jnp.int32(pos),
                                       key_valid=kv_mask, use_pallas=True)
                want = xla_decode_attention(q, kc, vc, jnp.int32(pos),
                                            key_valid=kv_mask)
                tag = f"B{B} S{S} Hkv{Hkv} rep{rep} pos{pos} valid={with_valid}"
                ok &= check(f"decode {tag}", got, want, 2e-2)

    # int8 quantized cache (per-row scales in [S, 128] planes), MHA and GQA
    from video_tokenizer_tpu.ops.decode_attention import _quantize_rows

    for (B, S, Hkv, rep, D) in [(8, 1152, 20, 1, 64), (4, 384, 4, 3, 64)]:
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, H, D), jnp.bfloat16)
        kf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        vf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        kq8, ks = _quantize_rows(kf)
        vq8, vs = _quantize_rows(vf)
        ksp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(ks.T)
        vsp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(vs.T)
        for pos in (0, S // 2, S - 1):
            got = decode_attention(q, kq8, vq8, jnp.int32(pos),
                                   k_scale=ksp, v_scale=vsp, use_pallas=True)
            want = xla_decode_attention(q, kq8, vq8, jnp.int32(pos),
                                        k_scale=ksp, v_scale=vsp)
            tag = f"int8 B{B} S{S} Hkv{Hkv} rep{rep} pos{pos}"
            ok &= check(f"decode {tag}", got, want, 2e-2)

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
