#!/usr/bin/env python
"""One-command round-start hygiene (VERDICT r10 item 6).

Three consecutive verdicts carried the same note: the driver's
evidence files (CORRECTNESS_r{N}.json, BENCH_r{N}.json,
BENCH_DETAIL.json) were still untracked when the next round's work
began, and the fingerprint stamp ran late.  This script makes the
round start a single command:

    python scripts/round_start.py

1. ``git add`` + commit any driver-written evidence artifacts
   (CORRECTNESS_r*.json, BENCH_r*.json, BENCH_DETAIL.json, VERDICT.md,
   ADVICE.md) so the round's window computation reads COMMITTED
   history, matching what the judge can reproduce.
2. Run ``registry_evidence --update`` — stamping fingerprints while
   current source is EXACTLY the source the driver just verified
   (editing anything first would stamp unverified source as verified;
   COVERAGE.md round-start discipline).
3. Commit the refreshed snapshot.
4. Print the projected driver window for the new round, classified
   (CHANGED / DUE / FRESH / fill) so the round's obligations are
   visible before any code is touched.

Idempotent: re-running with a clean tree and a current stamp makes no
commits and just prints the window.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_EVIDENCE_PATTERNS = (
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_DETAIL.json",
    "VERDICT.md",
    "ADVICE.md",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=_REPO, check=True, capture_output=True, text=True
    ).stdout


def _commit_if_dirty(message: str, *patterns: str) -> bool:
    _git("add", "--", *patterns)
    staged = _git("diff", "--cached", "--name-only").strip()
    if not staged:
        return False
    _git("commit", "-m", message)
    print(f"committed: {message}\n  " + staged.replace("\n", "\n  "))
    return True


def main() -> int:
    os.chdir(_REPO)

    # 0. fingerprint-integrity guards (VERDICT r11 item 1): a module
    # added mid-round must not introduce a bare-name collision or an
    # unexcluded module-level mutable — the exact hazards that make a
    # fingerprint silently stale.  Running the guard FILE here means a
    # red guard is caught at the round boundary, not by the judge.
    guard = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q",
            "tests/test_registry_evidence_hardening.py",
        ],
        cwd=_REPO,
    )
    if guard.returncode != 0:
        print("!! fingerprint-integrity guard red — fix before anything else")
        return guard.returncode

    # 1. driver evidence first — green_history() must read committed rows
    _commit_if_dirty(
        "round start: commit driver evidence artifacts", *_EVIDENCE_PATTERNS
    )

    # 2. stamp fingerprints BEFORE any code edit
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark import registry_evidence as ev

    qs, oracles = entry.queries(), entry.oracle_sql()
    updated = ev.update_snapshot(qs, oracles)
    print(f"snapshot refreshed for {len(updated)} queries green in latest round")

    # 3. commit the stamp
    _commit_if_dirty(
        "round start: registry_evidence --update fingerprint stamp",
        "clickhouse_table_copier_spark/registry_fingerprints.json",
        "clickhouse_table_copier_spark/registry_first_seen.json",
    )

    # 4. projected window, classified
    need = ev.must_front(qs, oracles)
    green = ev.green_history()
    window = ev.driver_window(qs, oracles)[: ev.DRIVER_WINDOW]
    changed = [n for n in window if n in need and green.get(n, 0)]
    fresh = [n for n in window if n in need and not green.get(n, 0)]
    due = [n for n in window if n not in need]
    backlog = [n for n in need if n not in window and not green.get(n, 0)]
    print(
        f"\nprojected window: {len(changed)} CHANGED, {len(due)} DUE/fill, "
        f"{len(fresh)} FRESH (of {len(need)} obligations; "
        f"{len(backlog)} FRESH deferred)"
    )
    for cls, names in (("CHANGED", changed), ("FRESH", fresh)):
        for n in names:
            print(f"  {cls}: {n}")
    if backlog:
        print("  deferred (FIFO):", ", ".join(backlog))
    miss = [n for n in need if n not in window and green.get(n, 0)]
    if miss:
        print("  !! CHANGED/DUE outside window (policy breach):", miss)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
