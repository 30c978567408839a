"""scripts/probe_host.py — the Spark-free effective-parallelism probe
bench.py stamps into every record (round-9 self-calibration)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from probe_host import probe  # noqa: E402


def test_probe_fields_and_bounds():
    r = probe(workers=2)
    assert set(r) == {
        "workers",
        "t_single_sec",
        "t_concurrent_sec",
        "effective_cores",
        "healthy",
    }
    assert r["workers"] == 2
    assert 0 < r["t_single_sec"] < 10
    assert 0 < r["t_concurrent_sec"] < 30
    # effective cores clamped to the worker count and positive
    assert 0 < r["effective_cores"] <= 2
    assert isinstance(r["healthy"], bool)


def test_probe_cli_prints_one_json_line():
    out = subprocess.run(
        [sys.executable, "scripts/probe_host.py"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120,
    )
    assert out.returncode == 0
    lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["workers"] >= 1 and rec["effective_cores"] > 0
