"""10x scale probe for the round-8h/8i batches: time each new query at
sf0.01 and sf0.1 (first + min-of-2 warm), print a markdown table for
SCALE.md. Run on an idle machine."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEW = [
    "ch_if_combinators",
    "ch_delta_sum",
    "theilsen_daily_trend",
    "hellinger_source_drift",
    "cohens_kappa_quality",
    "ann_rank_fusion",
    "wasserstein_value_drift",
    "zone_map_prune_estimate",
    "mase_seasonal_baseline",
    "ch_arg_min_max",
    "user_step_bitmask",
    "feature_hashing_collisions",
    "ab_srm_check",
    "pca_variance_explained",
    "embedding_whitening_check",
    "ann_ndcg_eval",
    "graph_degree_distribution",
    "graph_assortativity",
    "arrival_dispersion_index",
]


def main() -> None:
    import __spark_entry__ as entry
    from clickhouse_table_copier_spark.session import get_spark

    spark = get_spark(
        app_name="ctc-probe-r8h", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    results: dict[str, dict[str, tuple[float, float]]] = {}
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
                # NO clearCache here: bench.py keeps shared artifacts
                # persisted across queries, so clearing would measure
                # artifact REBUILD as if it were per-call cost (observed
                # 10.4 vs 1.1 s on graph_assortativity)
            results.setdefault(name, {})[key] = (ts[0], min(ts[1:]))
    print("| Query | sf0.01 first/warm | sf0.1 first/warm | warm factor |")
    print("|---|---|---|---|")
    for name in NEW:
        (f1, w1), (f2, w2) = results[name]["sf0.01"], results[name]["sf0.1"]
        print(f"| {name} | {f1:.2f}/{w1:.2f} | {f2:.2f}/{w2:.2f} | {w2 / w1:.1f}x |")


if __name__ == "__main__":
    main()
