"""Test config: force an 8-device virtual CPU mesh (SURVEY.md §4).

This is the TPU-native analogue of "test multi-node without a cluster": all
sharding/collective behavior runs on 8 virtual CPU devices. Must run before
any JAX backend initialization (the axon sitecustomize pins JAX_PLATFORMS to
the single-chip TPU tunnel, so env vars alone don't work).
"""
import os

# 8 virtual devices share ONE physical core on this machine, so a collective
# participant can be starved far past XLA:CPU's stuck-collective watchdog,
# which LOG(FATAL)s the whole process (intermittent aborts mid-suite on the
# giant GAN train_step). Raise the watchdog before backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: repeated GAN-step compiles dominate suite time
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_comp_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --------------------------------------------------------------- test tiers
# tests/durations.json (regenerate: tools/update_test_durations.py) records
# measured per-test wall times on this 1-core box; anything over the
# threshold is auto-marked `slow`. Gate tier = `pytest -m "not slow"`
# (<5 min, the pre-commit hook); full suite runs at round boundaries.
# Unmeasured (new) tests default to the fast tier until the ledger is
# regenerated.
_SLOW_THRESHOLD_S = float(os.environ.get("GATE_SLOW_THRESHOLD", "5.0"))

# Kernel-vs-XLA parity tests stay in the fast gate REGARDLESS of measured
# duration: they are the pre-commit safety net for ops/ changes (ADVICE r4
# — a contended ledger regen once pushed them past the threshold, which
# would have let a kernel commit through with only the smoke test), and
# two snapshot-landed unvalidated kernel changes cost real serving perf in
# rounds 3-4. ~75 s extra keeps the gate under its 5-min contract.
_ALWAYS_FAST = ("test_pallas_interpret.py",)


def pytest_collection_modifyitems(config, items):
    ledger_path = os.path.join(os.path.dirname(__file__), "durations.json")
    try:
        with open(ledger_path, encoding="utf-8") as f:
            ledger = json.load(f)
    except OSError:
        return
    for item in items:
        test_id = "tests/" + item.nodeid.split("tests/")[-1] \
            if "tests/" in item.nodeid else "tests/" + item.nodeid
        if any(p in test_id for p in _ALWAYS_FAST):
            continue
        if ledger.get(test_id, 0.0) >= _SLOW_THRESHOLD_S:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
