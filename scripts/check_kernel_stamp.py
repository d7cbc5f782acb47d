"""Pre-commit gate: kernel commits require a fresh on-chip validation stamp.

Invoked by the pre-commit hook (scripts/install_hooks.sh) whenever the
staged diff touches `video_tokenizer_tpu/ops/` or
`video_tokenizer_tpu/generation/`. Recomputes the kernel-tree sha over the
STAGED blobs and compares it to `.tpu_validation.json` (written only by
`tools/record_tpu_validation.py` after its checks pass on a real TPU).
A mismatch means the kernels being committed were never exercised on
hardware — the failure mode that shipped an 18% serving regression in the
round-3 snapshot (see ops/quant_matmul.py docstring).

No skip knob on purpose: run
    timeout 600 python tools/record_tpu_validation.py && git add .tpu_validation.json
when the tunnel is up. If the tunnel is down, the kernels can wait.
"""
from __future__ import annotations

import hashlib
import json
import subprocess
import sys

KERNEL_DIRS = ("video_tokenizer_tpu/ops", "video_tokenizer_tpu/generation")


def staged_kernel_sha() -> str:
    files = subprocess.run(
        ["git", "ls-files", *KERNEL_DIRS],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    h = hashlib.sha256()
    for f in sorted(files):
        blob = subprocess.run(
            ["git", "show", f":{f}"], capture_output=True, check=True
        ).stdout
        h.update(f.encode())
        h.update(blob)
    return h.hexdigest()


def main() -> int:
    try:
        raw = subprocess.run(
            ["git", "show", ":.tpu_validation.json"],
            capture_output=True, check=True,
        ).stdout
    except subprocess.CalledProcessError:
        try:
            raw = open(".tpu_validation.json", "rb").read()
        except FileNotFoundError:
            print(
                "pre-commit: staged changes touch video_tokenizer_tpu/"
                "{ops,generation}/ but no .tpu_validation.json stamp "
                "exists.\nRun: timeout 600 python "
                "tools/record_tpu_validation.py && git add "
                ".tpu_validation.json", file=sys.stderr,
            )
            return 1
    stamp = json.loads(raw)
    want = staged_kernel_sha()
    if stamp.get("kernel_tree_sha") != want:
        print(
            "pre-commit: kernel tree changed since the last on-chip "
            f"validation ({stamp.get('utc', '?')}).\n"
            f"  stamped: {stamp.get('kernel_tree_sha', '?')[:16]}…\n"
            f"  staged:  {want[:16]}…\n"
            "Kernels must be validated on hardware in the same state "
            "being committed.\nRun: timeout 600 python "
            "tools/record_tpu_validation.py && git add "
            ".tpu_validation.json", file=sys.stderr,
        )
        return 1
    print(f"pre-commit: kernel stamp OK ({stamp['utc']}, "
          f"{stamp['kernel_tree_sha'][:16]}…)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
