"""Pre-commit smoke gate: the package must import and a tiny model must jit.

Round 1 ended with an end-of-round snapshot that failed at `import
video_tokenizer_tpu.models` (half-landed int8 KV-cache change), which erased
the round's bench/multichip artifacts. This gate makes that class of commit
impossible: it imports every package module eagerly and compiles one tiny
AR decode step + one tiny tokenizer forward on CPU in a few seconds.

Run directly (`python scripts/smoke.py`) or via .git/hooks/pre-commit
(installed by scripts/install_hooks.sh).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    # 1. every module imports (registry wiring, no dangling imports)
    import video_tokenizer_tpu  # noqa: F401
    import video_tokenizer_tpu.data.video_dataset  # noqa: F401
    import video_tokenizer_tpu.generation.generate  # noqa: F401
    import video_tokenizer_tpu.metrics.fvd  # noqa: F401
    import video_tokenizer_tpu.models  # noqa: F401
    import video_tokenizer_tpu.parallel.fsdp  # noqa: F401
    import video_tokenizer_tpu.parallel.ring  # noqa: F401
    import video_tokenizer_tpu.parallel.tp  # noqa: F401
    import video_tokenizer_tpu.trainers.ar_trainer  # noqa: F401
    import video_tokenizer_tpu.trainers.tokenizer_trainer  # noqa: F401
    from video_tokenizer_tpu.registry import models as model_registry

    n = len(list(model_registry.keys()))
    assert n >= 57, f"model registry shrank: {n} entries"

    # 2. tiny AR prefill + decode step compiles and runs (the path that was
    # broken at round 1's HEAD)
    from video_tokenizer_tpu.generation import generate
    from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs

    cfg = ModelArgs(
        dim=32, n_layer=1, n_head=2, vocab_size=16, num_classes=3,
        max_seq_len=8, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0,
    )
    ar = LARP_AR(cfg)
    cond = jnp.array([0, 1])
    variables = ar.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 7), jnp.int32), cond
    )
    seq = generate(ar, variables, cond, 4, jax.random.PRNGKey(1))
    assert seq.shape == (2, 4)
    seq8 = generate(ar, variables, cond, 4, jax.random.PRNGKey(1),
                    cache_dtype=jnp.int8)
    assert seq8.shape == (2, 4)

    # 3. tiny tokenizer forward (encode -> VQ -> decode) compiles and runs,
    # built through the registry like train.py does
    tok = model_registry.make({
        "name": "larp_tokenizer",
        "args": {
            "input_size": 16, "frame_num": 4, "patch_size": 8,
            "temporal_patch_size": 2, "decoder_patch_size": 8,
            "decoder_temporal_patch_size": 2,
            "encoder_hidden_size": 32, "decoder_hidden_size": 32,
            "encoder_num_heads": 2, "decoder_num_heads": 2,
            "encoder_depth": 1, "decoder_depth": 1,
            "bottleneck_token_num": 4, "bottleneck_type": "vq",
            "prior_model": {"name": "none"},
            "bottleneck": {
                "name": "bottleneck",
                "args": {"bottleneck_dim": 8, "norm": "none",
                         "regularizer": {"name": "vq",
                                         "args": {"codebook_size": 16}}},
            },
        },
    })
    x = jnp.zeros((1, 3, 4, 16, 16))
    out = tok.init_with_output(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        x, train=False,
    )[0]
    assert out["pred_frames"].shape == x.shape

    # 4. no dead package modules: every module under video_tokenizer_tpu/
    # must be imported by at least one NON-TEST source file (round 2 landed
    # ops/cache_update.py with zero importers and zero tests — this makes
    # that class of commit impossible)
    dead = find_dead_modules()
    assert not dead, f"package modules with no importer outside tests: {dead}"
    print(f"smoke OK ({n} registry entries, no dead modules)")


def find_dead_modules():
    """Package modules (video_tokenizer_tpu/**/*.py) that no non-test source
    file imports. Matches both absolute (`video_tokenizer_tpu.ops.foo`) and
    relative (`from .foo import`, `from ..ops.foo import`) spellings."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "video_tokenizer_tpu")
    sources = {}  # path -> text, for all candidate importers
    for base in ("video_tokenizer_tpu", "tools", "scripts", "eval", "."):
        d = os.path.join(root, base)
        if not os.path.isdir(d):
            continue
        walk = os.walk(d) if base != "." else [(root, [], [
            f for f in os.listdir(root) if f.endswith(".py")
        ])]
        for dirpath, _, files in walk:
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    if os.path.samefile(p, os.path.abspath(__file__)):
                        continue  # smoke's own eager imports don't count
                    with open(p, encoding="utf-8") as fh:
                        sources[p] = fh.read()

    dead = []
    for dirpath, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py") or f == "__init__.py":
                continue
            mod_path = os.path.join(dirpath, f)
            rel = os.path.relpath(mod_path, root)[:-3].replace(os.sep, ".")
            stem = f[:-3]
            pat = re.compile(
                r"(?:from|import)\s+[\w.]*\b" + re.escape(stem) + r"\b"
            )
            if not any(
                pat.search(text)
                for p, text in sources.items()
                if p != mod_path
            ):
                dead.append(rel)
    return dead


if __name__ == "__main__":
    sys.exit(main())
