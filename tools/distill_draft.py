"""Distill a small draft model against a frozen AR target for speculative
decoding, and measure the REAL acceptance rate of the trained pair.

VERDICT r3 #7: the bench's acceptance knob was bracketed synthetically
(uniform heads ~1.0, independent sharp heads ~0.0); this provides the
missing MEASURED point from a draft actually TRAINED to match its target.

Recipe (bounded on-device budget, all fake data — no checkpoints needed):
  1. Sample `n_seq` full sequences FROM the target (on-policy prefixes —
     the distribution the draft must match at serving time).
  2. Teacher-forcing forward of the frozen target over those sequences
     gives per-position sampling distributions p(. | prefix).
  3. Train the draft with cross-entropy against p (soft labels, full-vocab
     KL up to the constant teacher entropy) for `steps` AdamW steps.
  4. `bench.py` then measures speculative tokens/s + acceptance with the
     distilled weights (`bench_speculative(draft_params_override=...)`).

The target here is the bench's randomly-initialized sharp-head 632M model,
so the learnable signal is its (hash-like) conditional structure — the
measured acceptance is a floor for real trained targets, which are far
more predictable. The machinery (sample -> soft-label distill -> serve) is
exactly what a user with a real checkpoint runs.

Reference bar: /root/reference/ar/generate.py:55-66 (the sampling
distribution the draft must approximate).
"""
from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def sample_target_sequences(target, t_variables, n_seq: int, seq_len: int,
                            key, temperature: float = 1.0,
                            top_k: int = 0) -> jax.Array:
    """Sample [n_seq, seq_len] on-policy sequences from the target
    (class-conditional, no CFG — the draft should match the raw conditional,
    CFG guidance is applied identically to both at serving time)."""
    from video_tokenizer_tpu.generation import generate

    cond = jnp.zeros((n_seq,), jnp.int32)
    return generate(target, t_variables, cond, seq_len, key,
                    cfg_scale=1.0, temperature=temperature, top_k=top_k)


@functools.partial(jax.jit, static_argnames=("target", "temperature"))
def target_soft_labels(target, t_variables, seqs, cond, temperature: float):
    """Teacher-forcing forward: p(. | prefix) [B, S, V] fp32 (frozen)."""
    logits, _ = target.apply(t_variables, seqs[:, :-1], cond)
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)


def distill(target, t_variables, draft, d_variables, key,
            steps: int = 150, batch: int = 8, seq_len: int = 1024,
            lr: float = 3e-4, temperature: float = 1.0,
            log=print) -> Tuple[dict, dict]:
    """Run the bounded distillation; returns (trained draft params bf16,
    stats). Budget: one target sampling pass + one teacher forward per
    refresh + `steps` draft fwd/bwd steps."""
    cond = jnp.zeros((batch,), jnp.int32)
    tx = optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.0)
    # fp32 masters for the tiny draft; bf16 compute
    params32 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), d_variables["params"]
    )
    opt = tx.init(params32)

    @jax.jit
    def distill_step(params32, opt, seqs, p_soft):
        def loss_fn(p32):
            pb = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), p32
            )
            logits, _ = draft.apply({"params": pb}, seqs[:, :-1], cond)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.sum(p_soft * logp, axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params32)
        updates, opt = tx.update(grads, opt, params32)
        return optax.apply_updates(params32, updates), opt, loss

    t0 = time.perf_counter()
    refresh_every = max(steps // 5, 1)
    losses = []
    for step in range(steps):
        if step % refresh_every == 0:
            key, k1 = jax.random.split(key)
            seqs = sample_target_sequences(
                target, t_variables, batch, seq_len, k1,
                temperature=temperature,
            )
            p_soft = target_soft_labels(
                target, t_variables, seqs, cond, temperature
            )
        params32, opt, loss = distill_step(params32, opt, seqs, p_soft)
        if step % 25 == 0 or step == steps - 1:
            losses.append(float(loss))
            log(f"[distill] step {step}: soft-CE {losses[-1]:.4f}")
    wall = time.perf_counter() - t0
    trained = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params32
    )
    stats = {"steps": steps, "wall_s": round(wall, 1),
             "first_loss": losses[0] if losses else None,
             "last_loss": losses[-1] if losses else None}
    return trained, stats


if __name__ == "__main__":
    # standalone smoke run on a tiny pair (CPU-safe)
    import argparse

    from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    common = dict(vocab_size=512 if args.tiny else 8192, num_classes=101,
                  max_seq_len=64 if args.tiny else 1024,
                  token_dropout_p=0.0, resid_dropout_p=0.0,
                  ffn_dropout_p=0.0, class_dropout_prob=0.0)
    tkw = (dict(n_layer=2, n_head=4, dim=128) if args.tiny
           else dict(n_layer=30, n_head=20, dim=1280))
    dkw = (dict(n_layer=1, n_head=2, dim=64) if args.tiny
           else dict(n_layer=8, n_head=12, dim=768))
    target = LARP_AR(ModelArgs(**tkw, **common))
    draft = LARP_AR(ModelArgs(**dkw, **common))
    B, S = (4, 64) if args.tiny else (8, 1024)
    idx = jnp.zeros((B, 8), jnp.int32)
    cond = jnp.zeros((B,), jnp.int32)
    tv = target.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    dv = draft.init({"params": jax.random.PRNGKey(1)}, idx, cond)
    tv = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), tv)
    dv = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), dv)
    # the LARP_AR output head is zero-init (reference parity) -> a raw-init
    # target is a UNIFORM teacher with zero distillation gradient; sharpen
    # its head so the smoke actually learns (bench_spec_trained does the
    # same via head_std)
    p = dict(tv["params"]); out = dict(p["output"])
    out["kernel"] = 0.11 * jax.random.normal(
        jax.random.PRNGKey(7), out["kernel"].shape, jnp.bfloat16)
    p["output"] = out; tv = {"params": p}
    trained, stats = distill(target, tv, draft, dv, jax.random.PRNGKey(2),
                             steps=args.steps, batch=B, seq_len=S,
                             lr=args.lr)
    print(stats)
