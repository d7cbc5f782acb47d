"""Record an on-chip TPU validation stamp for the kernel tree.

Round-3 and round-4 both landed kernel changes in end-of-round snapshots
with no recorded TPU run; one of them (the Pallas QuantDense backend,
3f8ac7f) cost 18% of flagship serving in the official ledger for two
rounds. This tool makes that class of slip mechanical to catch:

  1. runs a bounded on-chip sanity suite over the hot kernels
     (Pallas flash-attention fwd/bwd vs XLA, Pallas decode/chunk attention
     vs XLA, int8 paths), and
  2. writes `.tpu_validation.json` at the repo root: a sha256 of every
     tracked file under `video_tokenizer_tpu/ops/` and
     `video_tokenizer_tpu/generation/`, plus the check evidence.

The pre-commit hook (scripts/install_hooks.sh) refuses any commit that
changes those directories unless the stamp matches the staged content —
i.e. kernels can only be committed immediately after an on-chip run of
this tool (or tools/tpu_validate.sh, which ends by invoking it).

Run:  timeout 600 python tools/record_tpu_validation.py
"""
from __future__ import annotations

import datetime
import hashlib
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
KERNEL_DIRS = ("video_tokenizer_tpu/ops", "video_tokenizer_tpu/generation")
STAMP = ROOT / ".tpu_validation.json"


def kernel_tree_sha(root: Path = ROOT) -> str:
    """sha256 over (path, file bytes) of every tracked kernel file."""
    files = subprocess.run(
        ["git", "ls-files", *KERNEL_DIRS], cwd=root,
        capture_output=True, text=True, check=True,
    ).stdout.split()
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        h.update((root / f).read_bytes())
    return h.hexdigest()


def main() -> int:
    sys.path.insert(0, str(ROOT))
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    dev = jax.devices()
    if dev[0].platform != "tpu":
        print(f"refusing to stamp: default backend is {dev[0].platform}, "
              "not tpu", file=sys.stderr)
        return 2

    evidence = {}

    # ---- flash attention fwd/bwd vs XLA (bf16, causal + plain) ----------
    from video_tokenizer_tpu.ops.attention import attention

    def xla_attn(q, k, v, causal):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (q.shape[-1] ** -0.5)
        if causal:
            m = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
            s = jnp.where(m, s, -1e10)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 512, 64
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
               for _ in range(3))
    for causal in (False, True):
        def f_pallas(q, k, v):
            return attention(q, k, v, causal=causal).astype(jnp.float32).sum()

        def f_xla(q, k, v):
            qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            return xla_attn(qt, kt, vt, causal).sum()

        got, gotg = jax.value_and_grad(f_pallas)(q, k, v)
        want, wantg = jax.value_and_grad(f_xla)(q, k, v)
        err = float(jnp.abs(got - want) / (jnp.abs(want) + 1e-6))
        gerr = float(jnp.max(jnp.abs(gotg.astype(jnp.float32)
                                     - wantg.astype(jnp.float32))))
        assert err < 2e-2 and gerr < 2e-1, (causal, err, gerr)
        evidence[f"flash_attn_causal={causal}"] = {
            "fwd_rel_err": round(err, 6), "dq_max_abs_err": round(gerr, 4)
        }

    # ---- decode attention (Pallas vs XLA), bf16 + int8 cache ------------
    from video_tokenizer_tpu.ops.decode_attention import (
        _quantize_rows, decode_attention, xla_decode_attention,
    )

    B2, H2, D2, S2 = 16, 10, 64, 1024
    KV = H2 * D2
    qd = jnp.asarray(rng.randn(B2, H2, D2), jnp.bfloat16)
    kc = jnp.asarray(rng.randn(B2, S2, KV), jnp.bfloat16)
    vc = jnp.asarray(rng.randn(B2, S2, KV), jnp.bfloat16)
    pos = jnp.int32(700)
    got = decode_attention(qd, kc, vc, pos, use_pallas=True)
    want = xla_decode_attention(qd, kc, vc, pos)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    assert err < 5e-2, err
    evidence["decode_attn_bf16"] = {"max_abs_err": round(err, 4)}

    k8, ks = _quantize_rows(kc)
    v8, vs = _quantize_rows(vc)
    # [B, S] per-row scales -> [S, 128] planes (batch in the first B lanes)
    ks = jnp.zeros((S2, 128), jnp.float32).at[:, :B2].set(ks.T)
    vs = jnp.zeros((S2, 128), jnp.float32).at[:, :B2].set(vs.T)
    got8 = decode_attention(qd, k8, v8, pos, k_scale=ks, v_scale=vs,
                            use_pallas=True)
    want8 = xla_decode_attention(qd, k8, v8, pos, k_scale=ks, v_scale=vs)
    err8 = float(jnp.max(jnp.abs(got8.astype(jnp.float32)
                                 - want8.astype(jnp.float32))))
    assert err8 < 5e-2, err8
    evidence["decode_attn_int8"] = {"max_abs_err": round(err8, 4)}

    # ---- chunk (speculative verify) attention vs XLA --------------------
    from video_tokenizer_tpu.ops.decode_attention import (
        chunk_attention, xla_chunk_attention,
    )

    G = 5
    qc = jnp.asarray(rng.randn(B2, G, H2, D2), jnp.bfloat16)
    posv = jnp.asarray(rng.randint(300, 600, (B2,)), jnp.int32)
    gotc = chunk_attention(qc, k8, v8, posv, k_scale=ks, v_scale=vs)
    wantc = xla_chunk_attention(qc, k8, v8, posv, k_scale=ks, v_scale=vs)
    errc = float(jnp.max(jnp.abs(gotc.astype(jnp.float32)
                                 - wantc.astype(jnp.float32))))
    assert errc < 5e-2, errc
    evidence["chunk_attn_int8"] = {"max_abs_err": round(errc, 4)}

    stamp = {
        "kernel_tree_sha": kernel_tree_sha(),
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "device": str(dev[0]),
        "checks": evidence,
    }
    STAMP.write_text(json.dumps(stamp, indent=1) + "\n")
    print(json.dumps(stamp, indent=1))
    print(f"stamped {STAMP}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
