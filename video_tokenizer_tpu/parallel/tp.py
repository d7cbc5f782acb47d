"""Tensor-parallel shardings for the AR prior (Megatron-style, via GSPMD).

The reference has no tensor parallelism (SURVEY.md §2.3) — its largest
trained prior (632M) fits one GPU. Our zoo goes to 3.9B (`llama-abs-XXXL`),
which wants model parallelism on small TPU chips. TPU-first, this is NOT a
hand-written comm layer: we annotate parameter PartitionSpecs over the
('data', 'model') mesh and let the XLA partitioner insert the all-reduces
over ICI.

Layout (standard Megatron split for a llama block):
  * wqkv kernel  [dim, (H+2Hkv)*hd]  -> shard OUTPUT dim over 'model'
    (head-parallel attention; requires n_head % model_parallelism == 0)
  * wo kernel    [dim, dim]          -> shard INPUT dim  (row parallel)
  * w1/w3 kernel [dim, hidden]       -> shard OUTPUT dim (column parallel)
  * w2 kernel    [hidden, dim]       -> shard INPUT dim  (row parallel)
  * tok_embeddings [vocab, dim]      -> vocab-parallel rows (Megatron
    VocabParallelEmbedding; GSPMD emits the masked-gather + psum)
  * output head  [dim, vocab]        -> vocab-parallel columns; the CE
    log-softmax reduction over the sharded vocab dim is partitioned by XLA
    (local reduce + psum) instead of materializing full logits per chip
  * cls embedding / norms / abs_pe   -> replicated (tiny)
By default activations are replicated across 'model': each block costs one
psum after attention and one after the FFN — inserted automatically by
GSPMD. Under `sequence_parallel(mesh)` the inter-block activations are
additionally sharded over the sequence dim on 'model'
(Megatron-SP, arXiv:2205.05198): the partitioner converts each psum into a
reduce-scatter + all-gather pair, so norms/elementwise/dropout compute on
1/m of the tokens and the peak replicated-activation footprint drops by m.
"""
from __future__ import annotations

import threading
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def larp_ar_param_spec(path) -> P:
    """PartitionSpec for one AR-prior parameter, keyed by its tree path."""
    keys = [p.key for p in path if hasattr(p, "key")]
    if "wqkv" in keys or "w1" in keys or "w3" in keys:
        return P(None, "model")  # column parallel
    if "wo" in keys or "w2" in keys:
        return P("model", None)  # row parallel
    if "tok_embeddings" in keys and keys[-1] == "embedding":
        return P("model", None)  # vocab-parallel embedding rows
    if "output" in keys and keys[-1] == "kernel":
        return P(None, "model")  # vocab-parallel head columns
    return P()  # replicated


def vit_param_spec(path) -> P:
    """PartitionSpec for a tokenizer ViT-stack parameter
    (models/transformer.py naming: attn/{qkv,proj}, mlp/{fc1,fc2}).
    Standard Megatron split: qkv + fc1 column-parallel, attn-proj + fc2
    row-parallel; column-parallel biases shard with their outputs; every
    other leaf (LN, patchify, PEs, VQ codebook, query tokens) replicated —
    they are tiny next to the block matmuls."""
    keys = [p.key for p in path if hasattr(p, "key")]
    last = keys[-1] if keys else ""
    if "qkv" in keys or "fc1" in keys:
        return P(None, "model") if last == "kernel" else P("model")
    if ("proj" in keys and "attn" in keys) or "fc2" in keys:
        return P("model", None) if last == "kernel" else P()
    return P()


def shard_params_tp_vit(params: Any, mesh: Mesh) -> Any:
    """Place tokenizer params with Megatron TP shardings over `mesh`."""

    def place(path, leaf):
        spec = vit_param_spec(path)
        if len(spec) > len(getattr(leaf, "shape", ())):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


# --------------------------------------------------------- sequence parallel

_seq_parallel = threading.local()


class sequence_parallel:
    """Context manager: trace jitted AR steps inside it to shard inter-block
    activations [B, S, D] as P('data', 'model', None). The constraint is
    baked into the traced computation, so wrap the TRACING call (first
    invocation of the jitted fn), not just compilation."""

    def __init__(self, mesh: Mesh):
        self.sharding = NamedSharding(mesh, P("data", "model", None))

    def __enter__(self):
        _seq_parallel.sharding = self.sharding
        return self

    def __exit__(self, *exc):
        _seq_parallel.sharding = None


def seq_constraint(x: jax.Array) -> jax.Array:
    """Apply the ambient sequence-parallel constraint to a [B, S, D]
    activation (identity outside a `sequence_parallel` context or for
    non-rank-3 values). Called by the AR model between blocks."""
    sharding: Optional[NamedSharding] = getattr(
        _seq_parallel, "sharding", None
    )
    if sharding is None or getattr(x, "ndim", 0) != 3:
        return x
    if x.shape[1] % sharding.mesh.shape["model"] != 0:
        return x  # odd sequence length: leave unconstrained
    return jax.lax.with_sharding_constraint(x, sharding)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place AR-prior params with Megatron TP shardings over `mesh`."""

    def place(path, leaf):
        spec = larp_ar_param_spec(path)
        if len(spec) > len(getattr(leaf, "shape", ())):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer KV cache 'k'/'v' leaves [B, S, Hkv * head_dim]: batch over
    'data', the fused head dim over 'model'. Use `shard_cache` for whole
    cache pytrees — int8 caches carry rank-2 [S, 128] scale planes that must
    be replicated instead."""
    return NamedSharding(mesh, P("data", None, "model"))


def shard_cache(cache: Any, mesh: Mesh) -> Any:
    """Place every leaf of a per-layer KV cache pytree: rank-3 'k'/'v'
    buffers get `cache_sharding`; rank-2 int8 scale planes are replicated
    (they are tiny: [S, 128] fp32 per layer)."""
    kv = cache_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def place(leaf):
        return jax.device_put(leaf, kv if leaf.ndim == 3 else rep)

    return jax.tree_util.tree_map(place, cache)
