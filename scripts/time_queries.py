"""Isolated per-query timing harness (guide §1.4): times named queries
with the noop sink so the computation of EVERY column is measured without
sink cost, after the same warm-up bench.py performs.

Usage: python scripts/time_queries.py q1 q2 ... [--iters N] [--collect]

--collect times .collect() instead (bench.py's methodology) for numbers
comparable to the committed BENCH records. Prints one line per query:
name, min, all iterations.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from clickhouse_table_copier_spark.session import get_spark  # noqa: E402


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("queries", nargs="+")
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--collect", action="store_true")
    ns = parser.parse_args()
    args, iters, use_collect = ns.queries, ns.iters, ns.collect
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(app_name="ctc-time-queries", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # same warm-up as bench.py
    spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet").count()
    qs["partition_diff"](spark, sf_dir).collect()
    from clickhouse_table_copier_spark.operators.ranks import release_caches

    runs: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(iters):
        for name in args:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if use_collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_caches()
            spark.sparkContext.setJobDescription(None)
    for name in args:
        print(f"{min(runs[name]):7.3f}  {name}  {runs[name]}")


if __name__ == "__main__":
    main()
