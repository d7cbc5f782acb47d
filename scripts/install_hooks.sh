#!/bin/sh
# Install the pre-commit gate: smoke (import + tiny jit + dead-module scan)
# plus the fast test tier (`pytest -m "not slow"`, <5 min — slow tests are
# auto-marked from tests/durations.json). Set SKIP_GATE=1 to skip the test
# tier for a commit when it has just been run by hand on the same tree.
set -e
repo_root="$(git rev-parse --show-toplevel)"
hook="$repo_root/.git/hooks/pre-commit"
cat > "$hook" <<'EOF'
#!/bin/sh
cd "$(git rev-parse --show-toplevel)"
# gate 0: kernel commits (ops/ or generation/) require a matching on-chip
# validation stamp (.tpu_validation.json, written by
# tools/record_tpu_validation.py) — no skip knob; see VERDICT r4 weak #2
if git diff --cached --name-only | grep -qE '^video_tokenizer_tpu/(ops|generation)/'; then
  python scripts/check_kernel_stamp.py || exit 1
fi
# gate 1: import every module + jit a tiny AR decode and tokenizer fwd +
# fail on dead package modules
timeout 300 python scripts/smoke.py || exit 1
# gate 2: fast test tier (<5 min; slow tests excluded via tests/durations.json)
if [ -n "$SKIP_GATE" ]; then
  echo "pre-commit: SKIP_GATE set, skipping the test tier"
  exit 0
fi
exec timeout 600 python -m pytest tests/ -m "not slow" -q
EOF
chmod +x "$hook"
echo "installed $hook"
