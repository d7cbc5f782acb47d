"""Orbax-based checkpointing of training state.

Replaces the reference's torch checkpoint dicts + per-rank RNG gathering
(`/root/reference/trainers/base_trainer.py:783-891`): under single-program
SPMD the whole train state — params, both optimizer states, EMA params, the
jax.random key, and step — is ONE pytree; the RNG key travels inside it, so
there is no per-rank RNG gymnastics. The model spec (name + args) and full
config are stored alongside as metadata so `from_checkpoint` can rebuild the
model exactly like the reference's `ckpt['model']['args']` flow
(`models/larp_tokenizer.py:376-398`).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


# One long-lived async checkpointer: `ocp.StandardCheckpointer` is an
# AsyncCheckpointer, so a save dispatches the serialization + disk write to a
# background thread and `wait_until_finished` joins it. At most one save is
# in flight at a time (each save waits out the previous one). `_META_THREAD`
# publishes meta.json strictly AFTER the state commit, so no reader — even
# another process — can observe a meta.json whose state dir is absent.
_CKPTR: Optional[ocp.StandardCheckpointer] = None
_META_THREAD = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        import atexit

        _CKPTR = ocp.StandardCheckpointer()
        # interpreter teardown must not abandon an in-flight write
        atexit.register(wait_for_pending)
    return _CKPTR


def wait_for_pending():
    """Block until any in-flight async save has committed (state + meta)."""
    global _META_THREAD
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    if _META_THREAD is not None:
        _META_THREAD.join()
        _META_THREAD = None


def _write_meta(path: str, meta: Dict[str, Any]):
    # tmp + atomic rename: a crash mid-dump must not leave a committed
    # state dir next to a torn meta.json (that would fail every resume)
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    os.replace(tmp, _meta_path(path))


def save_checkpoint(
    path: str,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
    force: bool = True,
    block: bool = True,
):
    """Save a pytree `state` + JSON-serializable `meta` to directory `path`.

    `block=False` returns as soon as the device→host snapshot is taken and
    hands the disk write to a background thread (the reference's torch.save
    always blocks the epoch loop; see base_trainer.py:783-891). The snapshot
    is a host-side numpy copy, so donated device buffers reused by the next
    jitted step cannot corrupt an in-flight write. Orbax commits the state
    dir via tmp-dir + atomic rename, and meta.json is published only after
    that commit, so readers never see a partial or meta-only checkpoint; a
    crash mid-write leaves the destination absent, not torn.
    """
    global _META_THREAD
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    wait_for_pending()
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    ckptr.save(os.path.join(path, "state"), state, force=force)
    write_meta = meta is not None and jax.process_index() == 0
    if block:
        ckptr.wait_until_finished()
        if write_meta:
            _write_meta(path, meta)
    elif write_meta:
        import threading

        def _publish():
            ckptr.wait_until_finished()
            _write_meta(path, meta)

        _META_THREAD = threading.Thread(target=_publish, daemon=False)
        _META_THREAD.start()


def load_meta(path: str) -> Dict[str, Any]:
    with open(_meta_path(os.path.abspath(path))) as f:
        return json.load(f)


def restore_checkpoint(path: str, target: Any = None) -> Any:
    """Restore state saved by `save_checkpoint`. `target` gives the pytree
    structure/dtypes (abstract or concrete); None restores raw arrays."""
    path = os.path.abspath(path)
    wait_for_pending()  # never read a checkpoint still being written
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        def absify(x):
            if not hasattr(x, "dtype"):
                return x
            # preserve target shardings (e.g. FSDP layouts): orbax then
            # restores each leaf straight into its sharded placement
            sharding = getattr(x, "sharding", None)
            if isinstance(sharding, jax.sharding.NamedSharding):
                return jax.ShapeDtypeStruct(
                    np.shape(x), x.dtype, sharding=sharding
                )
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)

        abstract = jax.tree_util.tree_map(absify, target)
        return ckptr.restore(os.path.join(path, "state"), abstract)
    return ckptr.restore(os.path.join(path, "state"))


def checkpoint_exists(path: str) -> bool:
    wait_for_pending()  # observe any save dispatched earlier in program order
    return os.path.exists(os.path.join(os.path.abspath(path), "state"))
