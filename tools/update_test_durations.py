"""Regenerate tests/durations.json — the ledger that drives the `slow` tier.

tests/conftest.py auto-marks any test whose recorded duration exceeds the
threshold (default 5 s) as `slow`, so `pytest -m "not slow"` is the <5-min
pre-commit gate and the full suite runs at round boundaries. Tests without
an entry (newly added) default to the fast tier until measured here.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/durations.log
    python tools/update_test_durations.py /tmp/durations.log
"""
import json
import os
import re
import sys


def parse(path: str) -> dict:
    pat = re.compile(
        r"^(\d+\.\d+)s (call|setup|teardown)\s+(tests/\S+)", re.M
    )
    out = {}
    with open(path, encoding="utf-8") as f:
        for dur, phase, test_id in pat.findall(f.read()):
            out[test_id] = round(out.get(test_id, 0.0) + float(dur), 2)
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.log"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(root, "tests", "durations.json")
    durations = parse(src)
    if not durations:
        raise SystemExit(f"no '<N>s call tests/...' lines found in {src}")
    with open(dst, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(durations.items())), f, indent=0,
                  sort_keys=True)
        f.write("\n")
    slow = sum(1 for v in durations.values() if v >= 5.0)
    print(f"{dst}: {len(durations)} tests recorded, {slow} over the "
          "5s slow threshold")


if __name__ == "__main__":
    main()
