#!/bin/sh
# Install the pre-commit smoke gate (scripts/smoke.py): no commit can land
# if the package fails to import or a tiny jit breaks.
set -e
repo_root="$(git rev-parse --show-toplevel)"
hook="$repo_root/.git/hooks/pre-commit"
cat > "$hook" <<'EOF'
#!/bin/sh
# smoke gate: import every module + jit a tiny AR decode and tokenizer fwd
cd "$(git rev-parse --show-toplevel)"
exec timeout 300 python scripts/smoke.py
EOF
chmod +x "$hook"
echo "installed $hook"
