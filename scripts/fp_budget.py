#!/usr/bin/env python
"""Fingerprint-budget watchdog for optimization rounds.

Usage:
    python scripts/fp_budget.py save      # snapshot current v2 fingerprints
    python scripts/fp_budget.py diff      # list queries whose fingerprint
                                          # drifted from the saved snapshot

The driver re-verifies only the first 50 window slots; VERDICT r16 set
the per-round budget of CHANGED queries at <=35.  This tool makes the
fan-out of any helper edit visible BEFORE committing it.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SNAP = os.path.join(_REPO, "scripts", ".fp_budget_snapshot.json")


def _current() -> dict[str, str]:
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark import registry_evidence as ev

    qs, oracles = entry.queries(), entry.oracle_sql()
    return {
        n: ev.query_fingerprint(fn, oracles.get(n), version=2)
        for n, fn in qs.items()
    }


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "diff"
    cur = _current()
    if cmd == "save":
        with open(_SNAP, "w") as f:
            json.dump(cur, f, indent=1)
        print(f"saved {len(cur)} fingerprints")
        return 0
    with open(_SNAP) as f:
        base = json.load(f)
    changed = sorted(n for n in cur if base.get(n) != cur[n])
    gone = sorted(n for n in base if n not in cur)
    print(f"CHANGED vs snapshot: {len(changed)}")
    for n in changed:
        print(f"  {n}")
    if gone:
        print(f"!! queries REMOVED: {gone}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
