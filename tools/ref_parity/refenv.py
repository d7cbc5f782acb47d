"""Bootstrap for running the reference code on torch-CPU offline.

Call `setup()` BEFORE importing any reference module. It:
  1. prepends the stub packages and the reference tree to sys.path
     (reference first, so its `models`/`utils`/`datasets`/`trainers`
     shadow anything else; /root/reference/models is also added so the
     per-family `from model.* import ...` absolute imports resolve);
  2. patches torch's CUDA surface so the reference's hard-coded `.cuda()` /
     `torch.device('cuda', ...)` calls silently land on CPU (torch here is
     the CPU build).

Nothing here alters the reference's training math.
"""
from __future__ import annotations

import os
import sys

_REF = os.environ.get("REFERENCE_ROOT", "/root/reference")
_STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stubs")

_done = False


def setup() -> str:
    global _done
    if _done:
        return _REF
    for p in (_REF, _STUBS):
        if p not in sys.path:
            sys.path.insert(0, p)

    # The reference's per-family code does absolute imports of a top-level
    # `model` package (e.g. `from model.metrics.lpips import LPIPS` in
    # models/model_*/losses/loss_module.py) that in the upstream runs with
    # models/ on sys.path. Putting that directory on sys.path here would
    # shadow site-packages names (its bottleneck.py hijacks pandas'
    # optional `import bottleneck`), so alias model.* -> models.model.*
    # with a meta-path finder instead.
    import importlib
    import importlib.abc
    import importlib.util

    class _AliasLoader(importlib.abc.Loader):
        def __init__(self, real):
            self._real = real

        def create_module(self, spec):
            return importlib.import_module(self._real)

        def exec_module(self, module):
            pass

    class _ModelAliasFinder(importlib.abc.MetaPathFinder):
        def find_spec(self, fullname, path=None, target=None):
            if fullname != "model" and not fullname.startswith("model."):
                return None
            real = "models.model" + fullname[len("model"):]
            return importlib.util.spec_from_loader(
                fullname, _AliasLoader(real)
            )

    sys.meta_path.insert(0, _ModelAliasFinder())

    import torch

    def _is_cuda(x):
        return isinstance(x, (str, torch.device)) and "cuda" in str(x)

    def _map_args(args, kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs = dict(kwargs, device="cpu")
        return args, kwargs

    _tensor_to = torch.Tensor.to

    def _to_t(self, *a, **k):
        a, k = _map_args(a, k)
        return _tensor_to(self, *a, **k)

    torch.Tensor.to = _to_t

    _module_to = torch.nn.Module.to

    def _to_m(self, *a, **k):
        a, k = _map_args(a, k)
        return _module_to(self, *a, **k)

    torch.nn.Module.to = _to_m

    for _name in ("zeros", "ones", "empty", "full", "randn", "rand",
                  "randint", "arange", "tensor", "linspace", "as_tensor",
                  "eye"):
        def _wrap(orig):
            def f(*a, **k):
                if _is_cuda(k.get("device")):
                    k = dict(k, device="cpu")
                return orig(*a, **k)
            return f

        setattr(torch, _name, _wrap(getattr(torch, _name)))

    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.current_device = lambda: 0
    torch.cuda.empty_cache = lambda: None
    torch.cuda.device_count = lambda: 1
    torch.cuda.set_rng_state = lambda *a, **k: None
    torch.cuda.get_rng_state = lambda *a, **k: torch.empty(0,
                                                           dtype=torch.uint8)
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _done = True
    return _REF
