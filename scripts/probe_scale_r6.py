"""10x scale probe for the round-6b/6c/6d batches: time each new query
at sf0.01 and sf0.1 (min-of-2 warm), print a markdown table for
SCALE.md. Run on an idle machine."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW = [
    "nation_market_share",
    "nation_year_profit",
    "top_revenue_supplier",
    "part_supplier_variety",
    "large_volume_orders",
    "disjunctive_brand_revenue",
    "waiting_supplier_orders",
    "idle_customer_balances",
    "similarity_triangle_count",
    "vocab_frequency_spectrum",
    "streaming_dedup_survivors",
    "bucketed_colocated_join",
    "concurrent_sessions_curve",
    "stream_static_enrichment",
    "partitioned_scan_prune",
    "flag_month_unpivot",
    "source_lang_chi2",
]


def main() -> None:
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark.session import get_spark

    spark = get_spark(
        app_name="ctc-probe-r6", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    results: dict[str, dict[str, float]] = {}
    for sf_dir, key in [
        ("/root/testdata/sf0.01", "sf0.01"),
        ("/root/testdata/sf0.1", "sf0.1"),
    ]:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm
        for name in NEW:
            ts = []
            for _ in range(3):  # first run warms; min over the last two
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                ts.append(time.perf_counter() - t0)
            results.setdefault(name, {})[key] = min(ts[1:])
    print("| Query | sf0.01 | sf0.1 | factor |")
    print("|---|---|---|---|")
    for name in NEW:
        a, b = results[name]["sf0.01"], results[name]["sf0.1"]
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |")


if __name__ == "__main__":
    main()
