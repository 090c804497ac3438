"""Regenerate tests/durations.json from a full-suite duration log.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/full_suite.log
    python scripts/update_durations.py /tmp/full_suite.log

Sums call+setup+teardown per test nodeid and rewrites the manifest's `tests`
map, preserving threshold_seconds / always_slow_files. conftest.py consumes
the manifest to auto-mark the slow lane (see pytest_collection_modifyitems).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tests", "durations.json")


def main(log_path: str) -> None:
    sums: dict[str, float] = {}
    pat = re.compile(r"^\s*([\d.]+)s (?:call|setup|teardown)\s+(tests/\S+)")
    with open(log_path) as fh:
        for line in fh:
            m = pat.match(line)
            if m:
                sums[m.group(2)] = sums.get(m.group(2), 0.0) + float(m.group(1))
    if not sums:
        raise SystemExit(f"no duration lines found in {log_path} (run pytest with --durations=0)")
    with open(MANIFEST) as fh:
        manifest = json.load(fh)
    manifest["tests"] = {k: round(v, 2) for k, v in sorted(sums.items())}
    with open(MANIFEST, "w") as fh:
        json.dump(manifest, fh, indent=1)
    thresh = manifest["threshold_seconds"]
    n_fast = sum(1 for v in sums.values() if v <= thresh)
    print(f"wrote {MANIFEST}: {len(sums)} tests, {n_fast} fast at <= {thresh}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_suite.log")
