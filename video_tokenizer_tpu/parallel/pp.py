"""Pipeline parallelism (GPipe schedule) for the AR prior over a 'pipe' axis.

Beyond parity: the reference scales only by NCCL data parallelism
(/root/reference/train.py:162-169); its AR zoo tops out where one GPU's
memory does. Here the transformer trunk of `LARP_AR` (reference
models/larp_ar.py:239-266, the per-layer loop) can be split into
contiguous layer stages over a `pipe` mesh axis, composable with the
existing `data` axis, so the 3.9B `llama-abs-XXXL` trains across chips
whose individual HBM cannot hold it.

TPU-native design (NOT a port of torch pipeline frameworks):

  * Per-layer parameters are stacked into one [n_layer, ...] pytree
    (`stack_layer_params`) and sharded over 'pipe' on the leading dim —
    each device materializes only its own n_layer/n_stages layers.
  * Inside `shard_map`, the GPipe schedule is a single `lax.scan` over
    M + n_stages - 1 ticks: every tick each device runs its stage (a
    `lax.scan` over its layer slice) on its current microbatch and hands
    the activation to the next stage with one `lax.ppermute` hop over ICI.
    Compiler-friendly: static shapes, no data-dependent control flow — the
    bubble ticks compute on zeros and are masked out when the last stage
    collects results.
  * The whole schedule is differentiable: `jax.grad` through the scan +
    ppermute yields the reverse (backward-pipelined) schedule
    automatically — no hand-written backward pass, unlike GPipe/torch
    implementations.
  * Embeddings and the output head run outside the shard_map under plain
    GSPMD (they are tiny next to the trunk); the trunk output is psum'd
    over 'pipe' to broadcast the last stage's result.

Deterministic compute only (dropout/drop-path off): the flagship AR recipe
sets drop_path_rate=0, and PP training composes with optax exactly like the
replicated step. `tests/test_pp.py` pins loss and grads == single-device.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map


def create_pp_mesh(data: int, pipe: int) -> Mesh:
    """A (data, pipe) mesh. Lay 'pipe' innermost so stage hops ride
    neighbouring ICI links; on a multi-slice pod, split 'data' across
    slices so only the gradient all-reduce crosses DCN (see
    mesh.create_mesh)."""
    devices = jax.devices()
    if data * pipe != len(devices):
        raise ValueError(f"mesh {data}x{pipe} != {len(devices)} devices")
    from .mesh import slice_count

    n_slices = slice_count(devices)
    if n_slices > 1:
        if data % n_slices:
            raise ValueError(
                f"data axis {data} must be a multiple of the {n_slices} "
                "slices (the pipe axis cannot span DCN)"
            )
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data // n_slices, pipe),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
        return Mesh(dev_array, ("data", "pipe"))
    return Mesh(np.array(devices).reshape(data, pipe), ("data", "pipe"))


def stack_layer_params(params: Any, n_layer: int) -> Tuple[Any, Any]:
    """Split a LARP_AR param dict into (rest, stacked) where `stacked` holds
    the `layers_i` subtrees stacked on a new leading [n_layer] dim (every
    block has an identical treedef) and `rest` is everything else
    (embeddings, norm, head, PE)."""
    layers = [params[f"layers_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in params.items() if not k.startswith("layers_")}
    return rest, stacked


def unstack_layer_params(rest: Any, stacked: Any, n_layer: int) -> Any:
    """Inverse of `stack_layer_params` (checkpoint interchange with the
    replicated format)."""
    out = dict(rest)
    for i in range(n_layer):
        out[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out


def shard_params_pp(params: Any, mesh: Mesh, n_layer: int) -> Any:
    """Stack + place: layer stack sharded over 'pipe' (leading layer dim),
    the small rest replicated. Returns {'rest': ..., 'layers': ...} — the
    param pytree `pp_loss_fn` consumes (and whose grads mirror it)."""
    rest, stacked = stack_layer_params(params, n_layer)
    rest = jax.device_put(rest, NamedSharding(mesh, P()))
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("pipe", *([None] * (x.ndim - 1))))
        ),
        stacked,
    )
    return {"rest": rest, "layers": stacked}


def pp_logits_fn(model, mesh: Mesh, n_microbatch: int):
    """Teacher-forcing logits of `model` (a LARP_AR) with its trunk
    pipelined over mesh axis 'pipe' and the batch sharded over 'data'.

    Returns fn(pp_params, idx, cond_idx, train=False, rngs=None) -> logits,
    differentiable wrt pp_params (= output of `shard_params_pp`). The
    embeddings (incl. token dropout, hence `rngs`) and the output head run
    outside the shard_map; the trunk is deterministic. Requires
    n_layer % pipe == 0, per-data-shard batch % n_microbatch == 0, and
    drop_path_rate == 0.
    """
    from ..models.larp_ar import LARP_AR, TransformerBlock

    cfg = model.config
    n_stages = mesh.shape["pipe"]
    if cfg.n_layer % n_stages != 0:
        raise ValueError(f"n_layer={cfg.n_layer} not divisible by "
                         f"pipe={n_stages}")
    if cfg.drop_path_rate != 0.0:
        raise ValueError("pipeline trunk is deterministic; drop_path must "
                         "be 0")
    blk = TransformerBlock(cfg)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("pipe"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    def trunk(stacked, h):
        # stacked: this device's [n_layer/pipe, ...] layer slice;
        # h: this data-shard's [b_local, S, D] embeddings.
        b_local = h.shape[0]
        if b_local % n_microbatch != 0:
            raise ValueError(
                f"per-shard batch {b_local} not divisible by "
                f"n_microbatch={n_microbatch}"
            )
        h_mb = h.reshape(n_microbatch, b_local // n_microbatch, *h.shape[1:])
        p = jax.lax.axis_index("pipe")
        M = n_microbatch

        def stage(x):
            def body(x, lp):
                return blk.apply({"params": lp}, x), None

            if getattr(cfg, "remat", False):
                # gradient checkpointing per layer: the GPipe backward
                # recomputes each block instead of storing its activations
                body = jax.checkpoint(body)
            return jax.lax.scan(body, x, stacked)[0]

        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            buf, out = carry
            # stage 0 feeds from the microbatch stream, others from the
            # previous stage's ppermute'd activation
            inp = jnp.where(p == 0, h_mb[jnp.clip(t, 0, M - 1)], buf)
            y = stage(inp)
            widx = t - (n_stages - 1)
            write = jnp.logical_and(
                p == n_stages - 1,
                jnp.logical_and(widx >= 0, widx < M),
            )
            out = jnp.where(
                write,
                jax.lax.dynamic_update_index_in_dim(
                    out, y, jnp.clip(widx, 0, M - 1), 0
                ),
                out,
            )
            buf = jax.lax.ppermute(y, "pipe", perm)
            return (buf, out), None

        n_ticks = M + n_stages - 1
        (_, out), _ = jax.lax.scan(
            tick,
            (jnp.zeros_like(h_mb[0]), jnp.zeros_like(h_mb)),
            jnp.arange(n_ticks),
        )
        # only the last stage wrote real values; broadcast them to every
        # stage (zeros elsewhere make this an exact select)
        out = jax.lax.psum(out, "pipe")
        return out.reshape(b_local, *h.shape[1:])

    def fn(pp_params, idx, cond_idx, train: bool = False, rngs=None):
        rest = pp_params["rest"]
        h = model.apply(
            {"params": rest}, idx, cond_idx, train,
            method=LARP_AR.embed_inputs, rngs=rngs,
        )
        h = trunk(pp_params["layers"], h)
        return model.apply({"params": rest}, h, method=LARP_AR.head)

    return fn


def pp_loss_fn(model, mesh: Mesh, n_microbatch: int):
    """Teacher-forcing CE built on `pp_logits_fn` (see there for the
    pipelining contract). fn(pp_params, idx, cond_idx, targets, valid=None)
    -> scalar loss."""
    from ..models.larp_ar import ar_sequence_loss

    logits_fn = pp_logits_fn(model, mesh, n_microbatch)

    def fn(pp_params, idx, cond_idx, targets,
           valid: Optional[jax.Array] = None):
        logits = logits_fn(pp_params, idx, cond_idx)
        nll_sum, n = ar_sequence_loss(logits, targets, valid)
        return nll_sum / jnp.maximum(n, 1)

    return fn
