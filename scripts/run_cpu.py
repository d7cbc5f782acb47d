"""Run any repo CLI on the CPU backend: `python scripts/run_cpu.py train.py
--cfg ...`.

The container's axon sitecustomize registers the TPU tunnel backend for every
interpreter and the env pins JAX_PLATFORMS=axon, so when the tunnel is down a
bare `python train.py ...` hangs at backend init forever. Setting the env var
to cpu does NOT override the pin; `jax.config.update("jax_platforms", "cpu")`
BEFORE first backend use does (same trick as tests/conftest.py and
scripts/smoke.py). This wrapper applies it, fixes sys.argv, and execs the
target script as __main__.
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

if len(sys.argv) < 2:
    raise SystemExit("usage: python scripts/run_cpu.py <script.py> [args...]")

target = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(target, run_name="__main__")
