"""Weight-only int8 projection matmul (Pallas) — MICROBENCH TOOLING ONLY.

RETIRED from the serving path (round 5). This kernel shipped in the
round-3 snapshot as the QuantDense backend on the theory that both XLA
forms stream widened weight copies; a same-HEAD on-chip bisect A/B
(2026-08-21, 632M llama-abs-LP b=8 CFG int8-KV) showed the opposite —
inside the compiled decode scan it is the SLOWEST of the three algebras:

  * plain XLA weight-only `x @ w8.astype(bf16) * s`:  3660 tok/s (b32 5000)
  * dynamic w8a8 s8xs8 (round-3 b4eca4a):             3378 tok/s
  * this kernel (round-3 snapshot 3f8ac7f):           3000 tok/s (b32 4613)

The r3 "XLA hoists a bf16 weight copy out of the loop" claim came from
standalone microbenches, not the real scan: in the decode scan the weights
are loop-invariant *captured constants* and XLA fuses the int8->bf16
convert into each step's matmul without materializing a copy (the r2
artifact already showed int8 1.27x bf16). The standalone per-call shape
this kernel was tuned on misses the scan-level scheduling (likely cost:
pallas_call operand staging breaking XLA's fusion/overlap around each of
the 124 projections per step).

models/larp_ar.py::QuantDense now carries the winning XLA form and the
full A/B record. This file stays for kernel tooling —
tools/sweep_w8_tiles.py and tools/profile_serving_r4.py microbench it —
and as the written-down negative result: a Pallas kernel that wins a
standalone microbench can still lose end-to-end; only same-HEAD A/Bs in
the full program count.

Public entry: `w8_matmul(x, w8, scale)` — x [..., K] float, w8 [K, N] int8,
scale [N] fp32; returns [..., N] in x.dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _pallas_call


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _w8_kernel(x_ref, w_ref, s_ref, o_ref):
    # int8 -> bf16 is exact; fp32 accumulation on the MXU; the fp32
    # per-channel scale multiplies the accumulator (== scaling w, since
    # scale is constant along K).
    acc = jnp.dot(
        x_ref[:], w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype")
)
def _w8_matmul_2d(x, w8, scale, block_m: int, block_n: int, out_dtype):
    M, K = x.shape
    N = w8.shape[1]
    grid = (M // block_m, N // block_n)
    return _pallas_call(
        _w8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(x, w8, scale.reshape(1, N))


_warned_fallback = False

# None = auto-select; True/False force the Pallas kernel / XLA dot. The
# serving benches flip this to attribute projection time (tools/
# profile_serving_r4.py); product code leaves it None.
_FORCE_PATH = None


def w8_matmul(x: jax.Array, w8: jax.Array, scale: jax.Array) -> jax.Array:
    """y = x @ (w8 * scale[None, :]) streaming TRUE int8 weight bytes.

    x: [..., K] float; w8: [K, N] int8; scale: [N] fp32. Returns [..., N]
    in x.dtype (compute: bf16 operands, fp32 accumulation + scale). Falls
    back to the identical XLA algebra off-TPU or on tile-unaligned shapes
    (every real model's projections are 128-aligned)."""
    K, N = w8.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    import importlib

    # ops/__init__ re-exports the `attention` FUNCTION under the submodule's
    # name, so fetch the module itself for its interpret switch
    _attn_mod = importlib.import_module(".attention", __package__)
    use_pallas = (
        (jax.default_backend() == "tpu" or _attn_mod._INTERPRET)
        and K % 128 == 0
        and N % 128 == 0
    )
    if _FORCE_PATH is not None:
        use_pallas = use_pallas and _FORCE_PATH
    if not use_pallas:
        # correct but hoisting-prone XLA form: the whole point of the int8
        # serving mode (streaming int8 weight bytes) is lost here — say so
        # once instead of silently serving at bf16 speed (ADVICE r3)
        global _warned_fallback
        if not _warned_fallback and jax.default_backend() == "tpu":
            import warnings

            warnings.warn(
                f"w8_matmul: tile-unaligned projection [{K}, {N}] takes the "
                "XLA weight-dequant fallback — int8 weights will stream at "
                "bf16 speed for this layer", stacklevel=2,
            )
            _warned_fallback = True
        y = jnp.dot(
            x2.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return (y * scale).astype(x.dtype).reshape(*lead, N)

    # one M block for decode-sized rows; tile prefill-sized M
    block_m = min(256, _round_up(M, 16))
    pad_m = _round_up(M, block_m) - M
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    # largest 128-multiple divisor of N whose int8 block stays <= 4 MB
    # (double-buffered: 8 MB of the ~128 MB VMEM). The non-power-of-two
    # candidates matter: the llama SwiGLU hidden 3456 = 27*128 would
    # otherwise fall through to block_n=128 -> 27 short grid steps per call
    # (pipeline ramp dominates at decode-sized M). 128 is an unconditional
    # last resort (N % 128 == 0 is guaranteed by the use_pallas guard).
    block_n = _pick_block(
        N,
        [c for c in (1152, 1024, 768, 640, 512, 384, 256)
         if K * c <= 4 * 1024 * 1024] + [128],
    )
    y = _w8_matmul_2d(
        x2.astype(jnp.bfloat16), w8, scale.astype(jnp.float32),
        block_m, block_n, x.dtype,
    )
    if pad_m:
        y = y[:M]
    return y.reshape(*lead, N)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m
