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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
