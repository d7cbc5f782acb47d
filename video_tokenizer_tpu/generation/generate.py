"""Compiled KV-cache sampling for the AR prior.

Re-expresses `/root/reference/ar/generate.py` TPU-first: the reference runs a
Python loop of 1024 single-token CUDA dispatches (generate.py:105-123); here
the whole generation — prefill + every decode step + top-k/top-p sampling — is
ONE jitted program: a `lax.scan` whose carry holds the functional KV cache
(donated, so XLA updates it in place in HBM). No host round-trips.

Semantics parity:
  * `top_k_top_p_filtering` (generate.py:14-52): top-k thresholding and
    nucleus filtering with the keep-first-above-threshold shift. Implemented
    scatter-free via sorted-cutoff.
  * CFG batch doubling with null class, `cfg_interval` support
    (generate.py:77-102,127-141).
  * frame-prediction mode: prompt = conditioning frame tokens, cfg must be 1
    (generate.py:128-131).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def top_k_top_p_filtering(
    logits: jax.Array, top_k: int = 0, top_p: float = 1.0
) -> jax.Array:
    """Filter logits [..., V] for top-k and/or nucleus sampling."""
    if top_k > 0:
        top_k_eff = min(max(top_k, 1), logits.shape[-1])
        kth = jax.lax.top_k(logits, top_k_eff)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # shift right: keep also the first token that crosses the threshold
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        cutoff = jnp.min(
            jnp.where(remove, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return logits


def sample_from_logits(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
):
    """logits: [B, V] -> (idx [B, 1], probs [B, V])."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    if top_k > 0 or top_p < 1.0:
        logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
    probs = jax.nn.softmax(logits, axis=-1)
    if sample_logits:
        idx = jax.random.categorical(key, logits, axis=-1)
    else:
        idx = jnp.argmax(logits, axis=-1)
    return idx[:, None].astype(jnp.int32), probs


def _combine_cfg(logits, cfg_scale, cfg_flag):
    """logits: [2B, 1, V] (cond ‖ uncond) -> [B, V]."""
    b2 = logits.shape[0]
    cond, uncond = jnp.split(logits[:, -1, :], 2, axis=0)
    guided = uncond + (cond - uncond) * cfg_scale
    return jnp.where(cfg_flag, guided, cond)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "cfg_scale", "cfg_interval",
        "temperature", "top_k", "top_p", "sample_logits", "cache_dtype",
    ),
)
def generate(
    model,
    variables,
    cond: jax.Array,
    max_new_tokens: int,
    key: jax.Array,
    cfg_scale: float = 1.0,
    cfg_interval: int = -1,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
    emb_masks: Optional[jax.Array] = None,
    cache_dtype=None,
) -> jax.Array:
    """Sample `max_new_tokens` codes. cond: [B] classes or [B, T] frame tokens.

    Returns [B, max_new_tokens] int32. Fully compiled (prefill + scan).
    """
    use_cfg = cfg_scale > 1.0
    if model.frame_prediction:
        assert cfg_scale == 1.0, "frame prediction requires cfg_scale=1.0"
        cond_combined = cond
        T = cond.shape[1]
        B = cond.shape[0]
    elif model.model_type == "class_cond":
        B = cond.shape[0]
        if use_cfg:
            cond_null = jnp.full_like(cond, model.num_classes)
            cond_combined = jnp.concatenate([cond, cond_null])
        else:
            cond_combined = cond
        T = 1
    else:
        raise ValueError("please check model type")

    T_new = T + max_new_tokens
    cache_bs = B * 2 if use_cfg else B
    # Cache dtype follows the parameter dtype unless overridden: decode is
    # HBM-bandwidth-bound (every step re-reads the whole cache), so a bf16
    # model gets a bf16 cache — half the cache traffic per token. Softmax math
    # stays fp32 in Attention.decode_step either way.
    if cache_dtype is None:
        cache_dtype = variables["params"]["tok_embeddings"]["embedding"].dtype
        if cache_dtype not in (jnp.bfloat16, jnp.float16):
            cache_dtype = jnp.float32
    cache = model.apply(
        variables, cache_bs, T_new, cache_dtype, method=model.init_cache
    )

    # ---- prefill (emb_masks: invalid prompt positions masked as keys,
    # reference ar/generate.py:151-160)
    cond_mask = None
    key_valid = None
    if emb_masks is not None:
        cond_mask = (
            jnp.concatenate([emb_masks, emb_masks]) if use_cfg else emb_masks
        ).astype(bool)
        S_cache = cache[0]["k"].shape[1]
        key_valid = jnp.pad(
            cond_mask, ((0, 0), (0, S_cache - cond_mask.shape[1])),
            constant_values=True,
        )
    logits, cache = model.apply(
        variables, cond_combined, cache, cond_mask, method=model.prefill
    )
    if use_cfg:
        logits_last = _combine_cfg(logits, cfg_scale, True)
    else:
        logits_last = logits[:, -1, :]
    key, sub = jax.random.split(key)
    next_token, _ = sample_from_logits(
        sub, logits_last, temperature, top_k, top_p, sample_logits
    )

    # ---- decode loop
    def step(carry, i):
        cache, cur_token, key = carry
        key, sub = jax.random.split(key)
        # cur_token is the i-th generated token (1-based: i=1 is the prefill
        # sample), so it lives at absolute position T + i - 1 — both its KV
        # slot and its positional embedding (reference ar/generate.py:115-118:
        # input_pos starts at T for the first decoded token).
        pos = T + i - 1
        tok = jnp.concatenate([cur_token, cur_token]) if use_cfg else cur_token
        logits, cache = model.apply(
            variables, tok, pos, cache, key_valid, method=model.decode_step
        )
        if use_cfg:
            # scan index i is 1-based over decoded tokens (i=1 follows the
            # prefill sample), while the reference's decode_n_tokens index is
            # 0-based — its `i > cfg_interval` cutoff maps to (i - 1) here
            cfg_flag = (
                jnp.asarray(True)
                if cfg_interval <= -1
                else (i - 1) <= cfg_interval
            )
            logits_last = _combine_cfg(logits, cfg_scale, cfg_flag)
        else:
            logits_last = logits[:, -1, :]
        nxt, _ = sample_from_logits(
            sub, logits_last, temperature, top_k, top_p, sample_logits
        )
        return (cache, nxt, key), cur_token

    (cache, last_token, key), tokens = jax.lax.scan(
        step, (cache, next_token, key), jnp.arange(1, max_new_tokens)
    )
    # tokens: [max_new_tokens-1, B, 1] of the PREVIOUS token each step; append last
    seq = jnp.concatenate(
        [jnp.swapaxes(tokens[:, :, 0], 0, 1), last_token], axis=1
    )
    return seq
