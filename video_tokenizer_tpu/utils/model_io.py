"""Model (re)construction from checkpoints and the hub-id cache shim.

Equivalent of the reference's `from_checkpoint(path, version='sd'|'ema_{a}')`
classmethods (`/root/reference/models/larp_tokenizer.py:376-398`,
`models/larp_ar.py:420-430`): the Orbax checkpoint directory carries a
meta.json with the model spec (name + args), from which the module is rebuilt
via the registry, and the requested params version is pulled from the state.

`resolve_pretrained` / `load_model_pretrained` cover the reference's
`PyTorchModelHubMixin.from_pretrained` path (`larp_tokenizer.py:45`,
`larp_ar.py:233`, used by `sample.py:404-415`): an argument that is not an
existing local path is treated as a hub id and looked up in a local
converted-checkpoint cache ($VIDEO_TOKENIZER_TPU_HUB_CACHE, default
~/.cache/video_tokenizer_tpu/hub, one directory per id with '/' -> '--').
There is no network egress here, so a miss raises a clear error pointing at
the converter instead of downloading.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from .. import registry
from . import checkpoint as ckpt_lib

HUB_CACHE_ENV = "VIDEO_TOKENIZER_TPU_HUB_CACHE"
_DEFAULT_HUB_CACHE = "~/.cache/video_tokenizer_tpu/hub"

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


def hub_cache_dir() -> Path:
    return Path(
        os.environ.get(HUB_CACHE_ENV, _DEFAULT_HUB_CACHE)
    ).expanduser()


def resolve_pretrained(name_or_path: str) -> str:
    """Local path passes through; otherwise map a hub id to its converted
    checkpoint in the local cache (mirrors the exists()-gated fallback in
    reference sample.py:404-415)."""
    if os.path.exists(name_or_path):
        return name_or_path
    cand = hub_cache_dir() / name_or_path.replace("/", "--")
    if ckpt_lib.checkpoint_exists(str(cand)):
        return str(cand)
    raise FileNotFoundError(
        f"'{name_or_path}' is neither a local checkpoint directory nor a "
        f"cached hub model (looked in {cand}). This environment has no "
        "network egress: download the reference checkpoint elsewhere, "
        "convert it with tools/convert_reference_tokenizer.py, and place "
        f"the converted directory at {cand} (or point "
        f"${HUB_CACHE_ENV} at your cache)."
    )


def load_model_pretrained(
    name_or_path: str, version: str = "sd", spec_key: str = "model"
) -> Tuple[Any, Any]:
    """`from_pretrained` equivalent: hub id or local path -> (module,
    params)."""
    return load_model_from_checkpoint(
        resolve_pretrained(name_or_path), version, spec_key
    )


def load_model_from_checkpoint(
    path: str, version: str = "sd", spec_key: str = "model"
) -> Tuple[Any, Any]:
    """Returns (module, params). version: 'sd' or 'ema_{alpha}'."""
    from .. import models as _models  # noqa: F401  (registry population)

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
