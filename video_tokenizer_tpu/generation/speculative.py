"""Speculative decoding for the AR prior — a TPU-native serving multiplier.

The reference serves with one target-model forward per token
(/root/reference/ar/generate.py:105-123). Speculative decoding (Leviathan et
al. 2023 rejection-sampling scheme) drafts `gamma` tokens with a small model,
then verifies all of them with ONE target-model chunk forward
(LARP_AR.decode_chunk) — the target's weight/KV-cache HBM traffic, which
bounds decode throughput, is amortized over every accepted token. The output
distribution is EXACTLY the target model's sampling distribution (including
temperature/top-k/top-p filtering and CFG): accepted drafts pass a
min(1, p/q) test and the first rejection is resampled from norm(relu(p - q)).
`tests/test_speculative.py` pins both the per-step operator algebra and
end-to-end greedy equivalence with `generate`.

Batch rows accept different prefix lengths, so rows advance unevenly: all
bookkeeping (cache write offsets, PE lookups, attention masks, output
scatter) is per-row vectorized, and the whole loop — draft scan, chunk
verify, acceptance, commit — is one jitted `lax.while_loop` that exits when
the slowest row has `max_new_tokens` committed. Finished rows freeze
(commit 0 tokens per iteration) while the rest catch up.

Everything the single-model path supports rides along: CFG batch doubling
(acceptance runs on the post-CFG guided distributions of BOTH models),
frame-prediction prompts, emb_masks, bf16 or int8 KV caches (per model).
`cfg_interval` is not supported (the cutoff index would differ per row).

Performance: the two costs that made round 2's version LOSE to the plain
loop (1884 vs 3660 tok/s int8-KV) were XLA's handling of the per-row
uneven advance — (a) the per-row cache-row scatter lowers as a full-cache
rewrite (~560 us per k+v layer pair of [16,1024,1280] bf16 buffers even
inside a fori_loop), and (b) `xla_chunk_attention` reads the whole padded
cache every layer. Both are now Pallas kernels built latency-first (the
loop is DMA-latency bound, not bandwidth bound — measured with
tools/check_cache_update_tpu.py):

  * `ops/cache_update.write_rows_per_row` batches all rows' tile-aligned
    window DMAs in flight per program and overwrites the G target sublanes
    with fused vector selects (O(WL*KV) bytes per row vs O(S*KV) per
    buffer).
  * `ops/decode_attention.chunk_attention` fetches only the live-prefix
    cache blocks (per-row positions via scalar prefetch), with bf16
    temporaries so blocks are large and the pipeline is short.

bench.py carries three lines: the acceptance~1.0 mechanical ceiling,
a measured sub-1.0 acceptance point (sharpened independent heads), and
self-speculative early-exit drafting (`--self_draft_layers`).

Crossover acceptance (when speculative beats plain decode): one
speculative iteration costs a near-constant T_iter (gamma draft forwards +
one chunk verify) and commits E(a) = (1 - a^(gamma+1)) / (1 - a) tokens
per row at acceptance rate a. Measured r5, 632M target + 60M draft, both
int8 weights + int8 KV, gamma=4, b=8/CFG on one v5e: T_iter ~= 7.0 ms
(fits both endpoints: a~0 -> 1149 tok/s vs 1143 predicted; a~1 ->
5609 tok/s vs 5714 predicted), plain int8-KV decode = 3659 tok/s. The
crossover solves E(a*) = 3659 * T_iter / 8 = 3.20 tokens/iteration:

    a* ~= 0.78   (gamma=4, this draft/target pair)

Below ~0.78 acceptance, plain int8-KV decode wins; above it, speculative
wins, scaling to the 5609 tok/s ceiling at a=1. A production draft
distilled from the target (tools/distill_draft.py) is the knob that moves
a; bench.py's `spec_trained` section measures one bounded-budget point.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .generate import top_k_top_p_filtering


def self_draft(model, params: dict, n_draft_layers: int):
    """Build a self-speculative draft from the TARGET's own weights: the
    first `n_draft_layers` TransformerBlocks plus the shared embeddings /
    final norm / output head (early-exit drafting, LayerSkip-style — no
    separate draft checkpoint). Returns (draft_model, draft_params) for
    `speculative_generate`; params is the target's `variables['params']`.

    The rejection-sampling scheme keeps the OUTPUT distribution exactly the
    target's regardless of draft quality — a weak early exit only lowers the
    acceptance rate (throughput), never correctness. Layer params are named
    `layers_{i}` (LARP_AR.setup), so the draft's tree is a key-subset of the
    target's."""
    import dataclasses

    assert 1 <= n_draft_layers < model.config.n_layer
    draft_model = type(model)(
        dataclasses.replace(model.config, n_layer=n_draft_layers)
    )
    keep = {f"layers_{i}" for i in range(n_draft_layers)}
    draft_params = {
        k: v for k, v in params.items()
        if not k.startswith("layers_") or k in keep
    }
    return draft_model, draft_params


def sampling_dist(
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
) -> jax.Array:
    """The effective sampling distribution of `sample_from_logits` as an
    explicit probability vector [..., V]: temperature + top-k/top-p filtered
    softmax, or a one-hot argmax for greedy (sample_logits=False). Drawing
    `jax.random.categorical(key, jnp.log(dist))` reproduces the sampler
    (deterministically, for the one-hot case)."""
    logits = logits.astype(jnp.float32)
    if not sample_logits:
        return jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
        )
    logits = logits / max(temperature, 1e-5)
    if top_k > 0 or top_p < 1.0:
        logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
    return jax.nn.softmax(logits, axis=-1)


def residual_dist(p: jax.Array, q: jax.Array) -> jax.Array:
    """The rejection-resample distribution norm(relu(p - q)) [..., V].
    Degenerate case p == q (rejection probability 0, so the branch is
    unreachable — but lax evaluates both) falls back to p instead of 0/0.
    With q = 0 this is p itself, which makes the all-accepted bonus draw a
    plain sample from p — the caller pads q with a zero row for slot G."""
    diff = jnp.maximum(p - q, 0.0)
    s = jnp.sum(diff, axis=-1, keepdims=True)
    return jnp.where(s > 0, diff / jnp.maximum(s, 1e-30), p)


def _cfg_chunk(logits: jax.Array, cfg_scale: float) -> jax.Array:
    """[2B, G, V] (cond ‖ uncond) -> guided [B, G, V]."""
    cond, uncond = jnp.split(logits, 2, axis=0)
    return uncond + (cond - uncond) * cfg_scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "draft_model", "max_new_tokens", "gamma", "cfg_scale",
        "temperature", "top_k", "top_p", "sample_logits", "cache_dtype",
        "draft_cache_dtype", "return_stats",
    ),
)
def speculative_generate(
    model,
    variables,
    draft_model,
    draft_variables,
    cond: jax.Array,
    max_new_tokens: int,
    key: jax.Array,
    gamma: int = 4,
    cfg_scale: float = 1.0,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    sample_logits: bool = True,
    emb_masks: Optional[jax.Array] = None,
    cache_dtype=None,
    draft_cache_dtype=None,
    return_stats: bool = False,
):
    """Sample `max_new_tokens` codes from `model`, drafted by `draft_model`
    (`gamma` proposals per verification chunk). Same contract as
    `generate.generate` — cond: [B] classes or [B, T] frame tokens; returns
    [B, max_new_tokens] int32 distributed exactly as the target model's
    sampling distribution. `return_stats=True` additionally returns
    {"acceptance_rate", "iterations"} (acceptance_rate: fraction of draft
    proposals accepted, over non-frozen rows)."""
    assert gamma >= 1, "gamma must be >= 1"
    G = gamma
    N = max_new_tokens
    use_cfg = cfg_scale > 1.0
    assert model.frame_prediction == draft_model.frame_prediction
    assert model.model_type == draft_model.model_type

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

    cache_bs = B * 2 if use_cfg else B

    def _dtype(variables, override):
        if override is not None:
            return override
        d = variables["params"]["tok_embeddings"]["embedding"].dtype
        return d if d in (jnp.bfloat16, jnp.float16) else jnp.float32

    # chunk inputs reach absolute position T + (N - 1) + G for frozen rows;
    # init_cache rounds up to a multiple of 128
    S_need = T + N + G
    t_cache = model.apply(
        variables, cache_bs, S_need, _dtype(variables, cache_dtype),
        method=model.init_cache,
    )
    d_cache = draft_model.apply(
        draft_variables, cache_bs, S_need,
        _dtype(draft_variables, draft_cache_dtype),
        method=draft_model.init_cache,
    )

    cond_mask = None
    key_valid = None
    if emb_masks is not None:
        cond_mask = (
            jnp.concatenate([emb_masks, emb_masks]) if use_cfg else emb_masks
        ).astype(bool)
        S_cache = t_cache[0]["k"].shape[1]
        key_valid = jnp.pad(
            cond_mask, ((0, 0), (0, S_cache - cond_mask.shape[1])),
            constant_values=True,
        )

    # ---- prefill both models; token 0 is a plain target-model sample
    t_logits, t_cache = model.apply(
        variables, cond_combined, t_cache, cond_mask, method=model.prefill
    )
    _, d_cache = draft_model.apply(
        draft_variables, cond_combined, d_cache, cond_mask,
        method=draft_model.prefill,
    )
    if use_cfg:
        lg0 = _cfg_chunk(t_logits[:, -1:, :], cfg_scale)[:, 0]
    else:
        lg0 = t_logits[:, -1, :]
    key, sub = jax.random.split(key)
    p0 = sampling_dist(lg0, temperature, top_k, top_p, sample_logits)
    tok0 = jax.random.categorical(sub, jnp.log(p0), axis=-1)  # [B]

    out = jnp.zeros((B, N), jnp.int32).at[:, 0].set(tok0)
    n = jnp.ones((B,), jnp.int32)  # committed tokens per row
    last = tok0[:, None].astype(jnp.int32)  # [B, 1] newest committed token
    last2 = tok0[:, None].astype(jnp.int32)  # [B, 1] token before `last`
    #   (placeholder on iteration 0, where pn - 1 is a prompt slot)

    def dup(x):  # batch-double for CFG (cond rows first, like the caches)
        return jnp.concatenate([x, x], axis=0) if use_cfg else x

    def body(carry):
        (t_cache, d_cache, out, n, last, last2, key, iters,
         acc_num, acc_den) = carry
        key, k_draft, k_accept, k_fix = jax.random.split(key, 4)
        pn = T + n - 1  # [B] absolute position of `last` (pending input)
        active = n < N
        gkeys = jax.random.split(k_draft, G)

        def q_from(logits):
            lg = (
                _cfg_chunk(logits[:, -1:, :], cfg_scale)[:, 0]
                if use_cfg else logits[:, -1, :]
            )
            return sampling_dist(lg, temperature, top_k, top_p,
                                 sample_logits)

        # ---- draft G proposals with G forwards. The first forward feeds a
        # WIDTH-2 chunk [last2, last] at [pn - 1, pn]: rewriting pn - 1's
        # K/V (identical values — same token, same prefix) folds the KV fill
        # of the previous iteration's last proposal into this forward, so no
        # (G+1)-th fill-only draft forward is needed (it measured a full
        # draft-step 0.5 ms per iteration). Iteration 0 has no last2
        # (pn - 1 is a prompt slot whose K/V must not be re-derived from a
        # token embedding) -> width-1.
        def first_w1(d_cache):
            logits, d_cache = draft_model.apply(
                draft_variables, dup(last), dup(pn), d_cache, key_valid,
                method=draft_model.decode_chunk,
            )
            return d_cache, q_from(logits)

        def first_w2(d_cache):
            logits, d_cache = draft_model.apply(
                draft_variables, dup(jnp.concatenate([last2, last], axis=1)),
                dup(pn - 1), d_cache, key_valid,
                method=draft_model.decode_chunk,
            )
            return d_cache, q_from(logits)

        d_cache, q1 = jax.lax.cond(iters == 0, first_w1, first_w2, d_cache)
        d1 = jax.random.categorical(
            gkeys[0], jnp.log(q1), axis=-1
        ).astype(jnp.int32)

        def draft_step(dc, gk):
            d_cache, cur, g = dc
            logits, d_cache = draft_model.apply(
                draft_variables, dup(cur), dup(pn + g), d_cache, key_valid,
                method=draft_model.decode_chunk,
            )
            qdist = q_from(logits)
            nxt = jax.random.categorical(gk, jnp.log(qdist), axis=-1)
            return (d_cache, nxt[:, None].astype(jnp.int32), g + 1), \
                (qdist, nxt)

        (d_cache, _, _), (qs, ds) = jax.lax.scan(
            draft_step, (d_cache, d1[:, None], jnp.int32(1)), gkeys[1:]
        )
        # scan step j (0-based) feeds d_{j+1} at pn + j + 1 -> (q, d)_{j+2}
        d_tok = jnp.concatenate(
            [d1[:, None], jnp.swapaxes(ds, 0, 1)], axis=1
        )  # [B, G] proposals d_1..d_G
        q_probs = jnp.concatenate(
            [q1[:, None], jnp.swapaxes(qs, 0, 1)], axis=1
        )  # [B, G, V]

        # ---- ONE target chunk forward verifies last + all G proposals
        chunk = jnp.concatenate([last, d_tok], axis=1)  # [B, G+1]
        logits, t_cache = model.apply(
            variables, dup(chunk), dup(pn), t_cache, key_valid,
            method=model.decode_chunk,
        )
        lg = _cfg_chunk(logits, cfg_scale) if use_cfg else logits
        p_probs = sampling_dist(
            lg, temperature, top_k, top_p, sample_logits
        )  # [B, G+1, V]: p_1..p_{G+1}

        # ---- rejection sampling: accept d_g iff u_g < p_g(d_g) / q_g(d_g)
        p_d = jnp.take_along_axis(
            p_probs[:, :G], d_tok[..., None], axis=-1
        )[..., 0]
        q_d = jnp.take_along_axis(q_probs, d_tok[..., None], axis=-1)[..., 0]
        u = jax.random.uniform(k_accept, (B, G))
        accept = u * q_d < p_d  # [B, G]
        a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)

        # slot `a` (0-based) is corrected: resample from norm(relu(p - q)),
        # with q_[G+1] = 0 so the all-accepted bonus draw is a plain p-sample
        q_pad = jnp.concatenate(
            [q_probs, jnp.zeros_like(q_probs[:, :1])], axis=1
        )
        p_sel = jnp.take_along_axis(p_probs, a[:, None, None], axis=1)[:, 0]
        q_sel = jnp.take_along_axis(q_pad, a[:, None, None], axis=1)[:, 0]
        corrected = jax.random.categorical(
            k_fix, jnp.log(residual_dist(p_sel, q_sel)), axis=-1
        ).astype(jnp.int32)

        # ---- commit c = a + 1 tokens (capped at N - n; frozen rows 0)
        c = jnp.clip(a + 1, 0, N - n)
        g_iota = jnp.arange(G + 1)[None, :]
        cand = jnp.concatenate([d_tok, d_tok[:, -1:]], axis=1)  # [B, G+1]
        committed = jnp.where(g_iota < a[:, None], cand, corrected[:, None])
        cols = jnp.where(g_iota < c[:, None], n[:, None] + g_iota, N)
        out = out.at[jnp.arange(B)[:, None], cols].set(
            committed, mode="drop"
        )
        # the two newest committed tokens, uniformly over c: arr[:, j] is
        # the token at absolute emission index n - 2 + j, so new last2/last
        # (indices n + c - 2 / n + c - 1) are arr[:, c] / arr[:, c + 1] —
        # including the frozen c == 0 (both unchanged) and c == 1 cases
        arr = jnp.concatenate([last2, last, committed], axis=1)  # [B, G+3]
        last2 = jnp.take_along_axis(arr, c[:, None], axis=1)
        last = jnp.take_along_axis(arr, (c + 1)[:, None], axis=1)
        n = n + c
        acc_num = acc_num + jnp.sum(jnp.where(active, a, 0))
        acc_den = acc_den + jnp.sum(jnp.where(active, G, 0))
        return (t_cache, d_cache, out, n, last, last2, key, iters + 1,
                acc_num, acc_den)

    carry = (t_cache, d_cache, out, n, last, last2, key, jnp.int32(0),
             jnp.int32(0), jnp.int32(0))
    carry = jax.lax.while_loop(
        lambda c: jnp.min(c[3]) < N, body, carry
    )
    out, iters, acc_num, acc_den = carry[2], carry[7], carry[8], carry[9]
    if return_stats:
        stats = {
            "acceptance_rate": acc_num / jnp.maximum(acc_den, 1),
            "iterations": iters,
        }
        return out, stats
    return out
