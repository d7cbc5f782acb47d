"""FSDP / ZeRO-style parameter + optimizer-state sharding via GSPMD.

The reference trains its largest prior (632M) replicated under DDP; our zoo
goes to 3.9B (`llama-abs-XXXL`), whose fp32 params + Adam moments are ~47 GB
— past one chip's HBM. TPU-first, "FSDP" is not a wrapper class: every large
parameter is laid out sharded over the 'data' mesh axis with a
`NamedSharding`, the training step is jitted with those shardings as
`in_shardings`/`out_shardings` (or simply with pre-placed inputs), and the
XLA partitioner inserts the all-gather before each use and the
reduce-scatter on the gradients — the exact ZeRO-3 communication schedule,
derived by the compiler instead of hand-written hooks.

Optimizer state shards for free: optax moments mirror parameter shapes, so
`tree_map`-ing the same specs over `opt_state` gives ZeRO-1/2 at the same
time. Composes with tensor parallelism: pass `tp_spec_fn` (e.g.
`tp.larp_ar_param_spec`) and matmul dims take the 'model' axis while the
remaining large dim is sharded over 'data'.

Layout rule (standard GSPMD FSDP recipe): shard the largest dimension that
is divisible by the axis size and not already taken by TP; leave small
tensors (norms, biases, anything < `min_size` elements) replicated — the
gather latency would dominate their compute.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(
    shape,
    axis_size: int,
    axis: str = "data",
    tp_spec: Optional[P] = None,
    min_size: int = 2**16,
) -> P:
    """PartitionSpec sharding the largest free divisible dim over `axis`."""
    base = list(tp_spec) if tp_spec is not None else [None] * len(shape)
    while len(base) < len(shape):
        base.append(None)
    n = 1
    for d in shape:
        n *= d
    if n < min_size:
        return P(*base) if tp_spec is not None else P()
    # largest dim not already sharded by TP, divisible by the axis size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if base[i] is None and shape[i] % axis_size == 0:
            base[i] = axis
            return P(*base)
    return P(*base) if tp_spec is not None else P()


def fsdp_param_specs(
    params: Any,
    mesh: Mesh,
    axis: str = "data",
    tp_spec_fn: Optional[Callable[[Any], P]] = None,
    min_size: int = 2**16,
) -> Any:
    """Tree of PartitionSpecs for `params` (and, by shape, optimizer state)."""
    axis_size = mesh.shape[axis]

    def spec(path, leaf):
        tp_spec = tp_spec_fn(path) if tp_spec_fn is not None else None
        shape = getattr(leaf, "shape", ())
        if tp_spec is not None and len(tp_spec) > len(shape):
            tp_spec = None
        return fsdp_spec(shape, axis_size, axis, tp_spec, min_size)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_fsdp(
    params: Any,
    mesh: Mesh,
    axis: str = "data",
    tp_spec_fn: Optional[Callable[[Any], P]] = None,
    min_size: int = 2**16,
) -> Any:
    """Place params with FSDP(+TP) shardings over `mesh`."""
    specs = fsdp_param_specs(params, mesh, axis, tp_spec_fn, min_size)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_like_params(tree: Any, params_sharded: Any, mesh: Mesh) -> Any:
    """Place a pytree (e.g. optax state) to match sharded params.

    Matching is by tree-path SUFFIX + shape, not shape alone: optax moment
    trees embed the param tree (…/mu/<param path>), and under TP two
    equal-shaped kernels can carry different path-dependent shardings — a
    shape-keyed map would silently give one param's moments the other's
    layout. Leaves with no param match — step counters, scalars — are
    replicated.
    """

    def _path_keys(path):
        return tuple(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        )

    by_path = {}

    def record(path, p):
        by_path[_path_keys(path)] = (p.sharding, getattr(p, "shape", ()))

    jax.tree_util.tree_map_with_path(
        lambda path, p: record(path, p), params_sharded
    )
    rep = NamedSharding(mesh, P())

    def place(path, leaf):
        keys = _path_keys(path)
        shape = getattr(leaf, "shape", ())
        for cut in range(len(keys)):
            hit = by_path.get(keys[cut:])
            if hit is not None and hit[1] == shape:
                return jax.device_put(leaf, hit[0])
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, tree)
