"""Model (re)construction from checkpoints.

Equivalent of the reference's `from_checkpoint(path, version='sd'|'ema_{a}')`
classmethods (`/root/reference/models/larp_tokenizer.py:376-398`,
`models/larp_ar.py:420-430`): the Orbax checkpoint directory carries a
meta.json with the model spec (name + args), from which the module is rebuilt
via the registry, and the requested params version is pulled from the state.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from .. import registry
from . import checkpoint as ckpt_lib

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def _fix_spec(spec: Dict[str, Any]) -> Dict[str, Any]:
    spec = dict(spec)
    args = dict(spec.get("args", {}))
    if isinstance(args.get("dtype"), str):
        key = args["dtype"].replace("<class 'jax.numpy.", "").rstrip("'>")
        for name, dt in _DTYPE_MAP.items():
            if name in args["dtype"]:
                args["dtype"] = dt
                break
        else:
            args.pop("dtype")
    spec["args"] = args
    return spec


def load_model_from_checkpoint(
    path: str, version: str = "sd", spec_key: str = "model"
) -> Tuple[Any, Any]:
    """Returns (module, params). version: 'sd' or 'ema_{alpha}'."""
    meta = ckpt_lib.load_meta(path)
    if spec_key in meta:
        spec = meta[spec_key]
    else:
        spec = meta["cfg"][spec_key]
    model = registry.models.make(_fix_spec(spec))
    state = ckpt_lib.restore_checkpoint(path)
    if version == "sd":
        params = state["params"]
    elif version.startswith("ema"):
        alpha = version.split("_", 1)[1]
        params = state["ema_params"][alpha]
    else:
        raise ValueError(f"Unknown version: {version}")
    return model, params
