"""grain-based input pipeline: multiprocess decode + per-host shard + prefetch.

Replaces the reference's torch DataLoader + decord worker processes +
DistributedSampler (`/root/reference/trainers/base_trainer.py:312-323`).
TPU-native shape: one python process per host; grain worker processes decode
video on CPU; each host reads its shard of the global index space
(`ShardOptions(shard_index=process_index, shard_count=process_count)`); the
trainer places batches onto the device mesh with `parallel.shard_batch`.
"""
from __future__ import annotations

from typing import Iterable, Optional

import grain.python as grain
import jax
import numpy as np


def _stack_batch(items):
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals  # e.g. paths
    return out



def make_loader(
    dataset,
    batch_size: int,
    num_workers: int = 0,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    drop_remainder: bool = True,
    shard_by_process: bool = True,
) -> Iterable:
    """Returns an iterable of stacked numpy batches (global batch / n_hosts)."""
    if shard_by_process and jax.process_count() > 1:
        shard_options = grain.ShardOptions(
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            drop_remainder=True,
        )
    else:
        shard_options = grain.NoSharding()

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=shard_options,
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=dataset,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )

    def _iter():
        for batch in loader:
            if isinstance(batch, dict):
                yield batch
            else:
                yield _stack_batch(batch)

    return _iter()


def epoch_loader(dataset, batch_size, num_workers=0, shuffle=True, seed=0,
                 drop_remainder=True):
    """One-epoch loader (fresh shuffle per call via seed offset)."""
    return make_loader(
        dataset, batch_size, num_workers=num_workers, shuffle=shuffle,
        seed=seed, num_epochs=1, drop_remainder=drop_remainder,
    )
