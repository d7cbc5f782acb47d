"""Fused vector-quantization codebook lookup (Pallas TPU) + XLA fallback.

Replaces the reference's VQ distance scan (`/root/reference/models/bottleneck.py:262-290`):
a B*N x codebook_size matmul in forced fp32, followed by argmin (deterministic)
or `torch.multinomial` over softmaxed cosine similarity (stochastic).

TPU-native design:
  * One kernel computes scores (dot product, optionally bias-corrected for L2
    distance) tile-by-tile over the codebook and keeps a running argmax — the
    full [M, K] score matrix never materializes in HBM.
  * Stochastic sampling is re-expressed as Gumbel-max: argmax(logits*inv_temp + g)
    with g ~ Gumbel(0,1) from the on-core PRNG. This is distributionally
    identical to multinomial-over-softmax (same probabilities), fully fused,
    and reproducible from a single integer seed under pjit.
  * Codebook stays resident in VMEM across the M-grid (K<=16k, d<=128 fits).

Only indices are produced here (non-differentiable); the straight-through
estimator and codebook/commit losses live in the calling module where XLA
fuses them with the surrounding ops.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import DEFAULT_MASK_VALUE as NEG_INF  # shared sentinel
from .attention import _pallas_call, _pick_block, _round_up


def _vq_kernel(
    seed_ref, z_ref, emb_ref, bias_ref, idx_ref,
    *, block_k: int, num_codes: int, inv_temp: float, stochastic: bool,
):
    """Grid: (num_m_blocks,). z_ref: [bm, d]; emb_ref: [K_p, d]; bias_ref: [1, K_p]."""
    bm = z_ref.shape[0]
    mi = pl.program_id(0)
    if stochastic:
        pltpu.prng_seed(seed_ref[0], mi)

    z = z_ref[...].astype(jnp.float32)
    num_kb = pl.cdiv(num_codes, block_k)

    best_val0 = jnp.full((bm, 1), NEG_INF, dtype=jnp.float32)
    best_idx0 = jnp.zeros((bm, 1), dtype=jnp.int32)

    def body(kb, carry):
        best_val, best_idx = carry
        e = emb_ref[pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        bias = bias_ref[:, pl.ds(kb * block_k, block_k)]  # [1, block_k]
        s = jax.lax.dot_general(
            z, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s = s + bias
        k_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bm, block_k), 1
        )
        s = jnp.where(k_ids < num_codes, s, NEG_INF)
        if stochastic:
            s = s * inv_temp
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((bm, block_k)), jnp.int32
            )
            # keep low 24 bits -> non-negative int32 -> uniform in [0, 1)
            u = (bits & 0x00FFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
            g = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
            s = s + g
        blk_val = jnp.max(s, axis=1, keepdims=True)
        blk_arg = jnp.argmax(s, axis=1).reshape(bm, 1).astype(jnp.int32)
        blk_idx = kb * block_k + blk_arg
        take = blk_val > best_val
        return (
            jnp.where(take, blk_val, best_val),
            jnp.where(take, blk_idx, best_idx),
        )

    _, best_idx = jax.lax.fori_loop(0, num_kb, body, (best_val0, best_idx0))
    idx_ref[...] = jnp.broadcast_to(best_idx, (bm, 128))


def vq_lookup_pallas(
    z: jax.Array,
    emb: jax.Array,
    score_bias: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    inv_temp: float = 1.0,
    seed=0,
    block_m: int = 512,
    block_k: int = 2048,
) -> jax.Array:
    """argmax_k (z @ emb.T + score_bias[k]) (+ Gumbel if stochastic). z: [M, d]."""
    M, d = z.shape
    K = emb.shape[0]
    # divisor-of-rounded-length blocks (see attention._pick_block): the
    # codebook scan covers round_up(K, 128) rows instead of a full final
    # block (K=2100 used to pad to 4096; now K_p=2176), and the M grid
    # wastes at most 7 pad rows.
    block_m = _pick_block(M, block_m, base=8)
    block_k = _pick_block(K, block_k)
    M_p = _round_up(M, block_m)
    K_p = _round_up(K, block_k)

    if score_bias is None:
        score_bias = jnp.zeros((K,), jnp.float32)
    z_p = jnp.pad(z, ((0, M_p - M), (0, 0)))
    emb_p = jnp.pad(emb, ((0, K_p - K), (0, 0)))
    bias_p = jnp.pad(score_bias.astype(jnp.float32), (0, K_p - K)).reshape(1, K_p)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(
        _vq_kernel,
        block_k=block_k,
        num_codes=K,
        inv_temp=float(inv_temp),
        stochastic=stochastic,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_p // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((K_p, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, K_p), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, 128), lambda i, *_: (i, 0)),
    )
    idx = _pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_p, 128), jnp.int32),
    )(seed_arr, z_p, emb_p, bias_p)
    return idx[:M, 0]


def vq_lookup_xla(
    z, emb, score_bias=None, *, stochastic=False, inv_temp=1.0, key=None
):
    """XLA fallback; same semantics (Gumbel-max for the stochastic path)."""
    s = jnp.einsum(
        "md,kd->mk", z.astype(jnp.float32), emb.astype(jnp.float32)
    )
    if score_bias is not None:
        s = s + score_bias.astype(jnp.float32)[None, :]
    if stochastic:
        s = s * inv_temp
        if key is None:
            raise ValueError("stochastic VQ lookup needs a PRNG key")
        g = jax.random.gumbel(key, s.shape, jnp.float32)
        s = s + g
    return jnp.argmax(s, axis=-1).astype(jnp.int32)


def vq_lookup(
    z,
    emb,
    *,
    metric: str = "l2",
    stochastic: bool = False,
    inv_temp: float = 1.0,
    key: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
):
    """Nearest-code lookup. z: [..., d] -> indices [...].

    metric='l2'  : argmin ||z - e||^2  == argmax (z.e - |e|^2/2).
    metric='cos' : argmax z.e  (caller pre-normalizes z and emb).
    stochastic   : sample ~ softmax(score * inv_temp) via Gumbel-max.
    """
    batch_shape = z.shape[:-1]
    d = z.shape[-1]
    zf = z.reshape(-1, d)
    zf = jax.lax.stop_gradient(zf)
    emb = jax.lax.stop_gradient(emb)

    if metric == "l2":
        bias = -0.5 * jnp.sum(emb.astype(jnp.float32) ** 2, axis=-1)
    elif metric == "cos":
        bias = None
    else:
        raise ValueError(metric)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        if stochastic:
            if key is None:
                raise ValueError("stochastic VQ lookup needs a PRNG key")
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
        else:
            seed = 0
        idx = vq_lookup_pallas(
            zf, emb, bias, stochastic=stochastic, inv_temp=inv_temp, seed=seed
        )
    else:
        idx = vq_lookup_xla(
            zf, emb, bias, stochastic=stochastic, inv_temp=inv_temp, key=key
        )
    return idx.reshape(batch_shape)
