"""The one-line full gate: every registered query vs its DuckDB oracle
in a FRESH DEFAULT Spark session (no tuned confs, 200 shuffle
partitions) — catches session-dependence the per-query pytest drives
miss (the test suite runs under the tuned session fixture).

Usage: python scripts/run_default_session_gate.py [sf_dir]
Prints one line per failing query and a final PASS/FAIL summary line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle_harness import compare, run_oracle

    # DEFAULT session on purpose: no shuffle-partition tuning, no AQE
    # overrides — whatever SparkSession gives out of the box.
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(sorted(qs)):
        try:
            sdf = qs[name](spark, sf_dir)
            odf = run_oracle(oracles[name], sf_dir)
            compare(sdf, odf, name)
        except AssertionError as e:
            failures.append((name, str(e).split("\n")[0]))
            print(f"FAIL {name}: {e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep going
            failures.append((name, f"{type(e).__name__}: {e}"))
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(qs)} checked, "
                f"{len(failures)} failing, {time.time() - t0:.0f}s",
                flush=True,
            )
        # release caller-owned persisted frames between queries, as
        # bench.py does, so storage memory doesn't accumulate
        try:
            from clickhouse_table_copier_spark.operators import ranks

            ranks.release_caches()
        except Exception:
            pass
    status = "PASS" if not failures else "FAIL"
    print(
        f"{status}: {len(qs) - len(failures)}/{len(qs)} queries match "
        f"in a default session at {sf_dir} ({time.time() - t0:.0f}s)",
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
