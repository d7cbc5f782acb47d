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
  * embeddings / norms / head        -> replicated (vocab is small: 8192)
Activations stay replicated across 'model'; each block costs one psum after
attention and one after the FFN — inserted automatically by GSPMD.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def larp_ar_param_spec(path) -> P:
    """PartitionSpec for one AR-prior parameter, keyed by its tree path."""
    keys = [p.key for p in path if hasattr(p, "key")]
    if "wqkv" in keys or "w1" in keys or "w3" in keys:
        return P(None, "model")  # column parallel
    if "wo" in keys or "w2" in keys:
        return P("model", None)  # row parallel
    return P()  # replicated


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
