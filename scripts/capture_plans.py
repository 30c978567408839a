"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python scripts/capture_plans.py before|after [query ...]

Writes plans/$CTC_PLANS_ROUND/<name>_<tag>.txt (default round: r17) for
each headline query (or the named subset; non-headline registered names
are allowed in the subset). The judge reads these files to check plan
claims against the code; the formatted explain includes Exchange
placement, join strategy, PushedFilters and ReadSchema.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE list)
import __spark_entry__ as entry  # noqa: E402
from clickhouse_table_copier_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("CTC_PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="ctc-plan-capture", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = [n for n in bench.HEADLINE if not only or n in only]
    names += [n for n in sorted(only) if n not in bench.HEADLINE and n in qs]
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
