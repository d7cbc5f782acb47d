"""Device mesh + sharding helpers.

The reference scales with one-process-per-GPU NCCL DDP
(`/root/reference/train.py:162-169`, `trainers/base_trainer.py:128-131`).
The TPU-native design collapses that into a single SPMD program over a
`jax.sharding.Mesh`:

  * axis "data"  — batch (data parallel); gradient mean happens inside jit.
  * axis "model" — optional tensor parallelism for large AR models (the
    reference has no TP; we expose it for the 1.4B/3.9B `llama-abs-XX(X)L`
    zoo where a single chip is not enough).

All collectives ride ICI via XLA (psum/all_gather inserted by the partitioner);
there is no hand-written comm layer.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshConfig:
    data: int = -1  # -1: use all remaining devices
    model: int = 1
    seq: int = 1  # ring-attention context parallelism (parallel/ring.py)

    def resolve(self, n_devices: Optional[int] = None):
        n = n_devices if n_devices is not None else jax.device_count()
        model = max(1, self.model)
        seq = max(1, self.seq)
        data = self.data if self.data > 0 else n // (model * seq)
        if data * seq * model != n:
            raise ValueError(
                f"mesh {data}x{seq}x{model} does not cover {n} devices"
            )
        return data, seq, model


def slice_count(devices: Sequence[jax.Device]) -> int:
    """Number of distinct TPU slices among `devices` (1 for CPU/GPU or a
    single slice; devices without a slice_index count as one slice)."""
    ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    return max(len(ids), 1)


def create_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the (data, model) mesh.

    On a MULTI-SLICE TPU pod (devices spanning several ICI domains joined by
    DCN), the device order matters: the slower DCN links must carry only the
    outermost 'data'-axis collectives (gradient all-reduce tolerates DCN
    latency; Megatron TP's per-layer all-reduces do not). We lay the mesh out
    hybrid — data split across slices first, then within-slice — via
    `mesh_utils.create_hybrid_device_mesh`, so 'model' (and the within-slice
    part of 'data') always rides ICI. Single-slice / CPU fall back to a plain
    reshape. This is the "pick a mesh so collectives ride ICI, not DCN"
    recipe; the reference is single-node NCCL and has no analogue."""
    config = config or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    data, seq, model = config.resolve(len(devices))
    n_slices = slice_count(devices)
    if n_slices > 1:
        if data % n_slices:
            raise ValueError(
                f"data axis {data} must be a multiple of the {n_slices} "
                "slices (model/pipe/seq axes cannot span DCN)"
            )
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data // n_slices, seq, model),
            dcn_mesh_shape=(n_slices, 1, 1),
            devices=devices,
        )
        return Mesh(dev_array, axis_names=("data", "seq", "model"))
    dev_array = np.array(devices).reshape(data, seq, model)
    return Mesh(dev_array, axis_names=("data", "seq", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over 'data', replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch pytree with batch-dim sharded over 'data'.

    Ragged batches (batch not divisible by the data axis, e.g. an eval
    loader tail) fall back to replication rather than failing."""
    n_data = mesh.shape["data"]

    def _place(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data != 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_place, batch)
