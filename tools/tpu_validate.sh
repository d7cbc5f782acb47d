#!/usr/bin/env bash
# One-shot TPU validation pass — run when the axon tunnel is up.
#
# Orders the checks so a broken kernel fails fast before the long benches:
#   1. kernel parity on hardware (Pallas vs XLA, fwd+bwd+decode)
#   2. kernel microbench (block sizes / GQA streaming / no-bias decode)
#   3. bench.py headline JSON (+ extras printed to stderr)
#   4. decode profile attribution (optional, slow)
#
# Every step is bounded: the tunnel can die mid-run (jax calls then hang
# forever), so a wedged step must not wedge the whole pass.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_validate}
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -5 "$LOG/$name.log"
  if [ $rc -ne 0 ]; then
    echo "!!! $name FAILED rc=$rc (full log: $LOG/$name.log)"
    # rc=124: timeout — likely a tunnel outage, stop rather than queue
    # more hangs
    [ $rc -eq 124 ] && exit 124
    return $rc
  fi
}

run probe       120 python -c "import jax; print(jax.devices())" || exit 1
run kernels     900 python tools/check_attention_tpu.py || exit 1
run microbench  900 python tools/bench_kernels.py
run bench      1800 python bench.py
# record the kernel-tree validation stamp so the pre-commit gate accepts
# kernel commits made in this tree state (scripts/check_kernel_stamp.py)
run stamp       600 python tools/record_tpu_validation.py
echo "=== done; logs in $LOG ==="
echo "next: update README.md/PARITY.md perf lines from $LOG/bench.log"
