"""Cross-framework training-dynamics parity (tools/reference_parity.py).

Runs the ACTUAL reference trainer (torch-CPU, offline stubs) for a few
steps, replays the same batches from the same converted init through our
trainer, and asserts the per-step loss trajectories agree. See the harness
docstring for the full design; measured agreement is ~1e-4 relative over 8
steps, asserted here at 1% to absorb BLAS variation across hosts.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tools", "reference_parity.py")
REFERENCE = os.environ.get("REFERENCE_ROOT", "/root/reference")


def _run_parity(tmp_path, trainer, steps):
    out = str(tmp_path / "parity")
    env = dict(os.environ)
    # each phase sets its own platform/precision internally
    for phase in ("ref", "ours"):
        r = subprocess.run(
            [sys.executable, HARNESS, phase, "--out", out,
             "--steps", str(steps), "--trainer", trainer],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        assert r.returncode == 0, f"{phase} failed:\n{r.stdout}\n{r.stderr}"

    r = subprocess.run(
        [sys.executable, HARNESS, "compare", "--out", out,
         "--rtol", "0.01", "--trainer", trainer],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"compare failed:\n{r.stdout}\n{r.stderr}"
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["parity_ok"] and summary["steps"] == steps


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)
def test_tokenizer_loss_trajectories_match(tmp_path):
    _run_parity(tmp_path, "tokenizer", 4)


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)
def test_ar_loss_trajectories_match(tmp_path):
    """Covers the frozen-vae encode, CE loss, and the AdamW minGPT
    decay/no-decay split (weight_decay 0.05 active)."""
    _run_parity(tmp_path, "ar", 4)
