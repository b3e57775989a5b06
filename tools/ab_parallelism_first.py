"""Interleaved A/B: spark.sql.adaptive.coalescePartitions.parallelismFirst.

Spark defaults the flag to TRUE: AQE coalescing stops at the session's
default parallelism, so every tiny shuffle still runs one task wave per
core (32 here).  The Spark SQL tuning guide recommends FALSE in
production so the advisory partition size governs.  This harness
measures the flag per query, interleaved A/B/A/B in ONE session so host
phase drift cancels, over a subset spanning the engine's shapes (tail
aggregates, pair joins, windows, cogrouped Arrow kernels, iterative
closures).

Usage: python tools/ab_parallelism_first.py [repeat]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from myrecommendsystem_spark.plans import registry  # noqa: E402
from myrecommendsystem_spark.session import get_spark  # noqa: E402

QUERIES = [
    # tail single-aggregate shapes (the 150-query floor)
    "events_funnel_conversion",
    "events_ema_daily",
    "users_churn_labels",
    "stats_rate_more_recently_products",
    "events_key_skew_profile",
    # pair/shuffle-heavy
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "itemcf_similarities",
    # window / topk
    "topk_orders_per_customer",
    # joins
    "orders_basket_lift",
    "revenue_by_nation",
    # cogrouped Arrow kernel AFTER a shuffle (parallelism-sensitive)
    "recsys_mmr_rerank",
    # LSH + component closure composition
    "embedding_semantic_survivors",
    # probe-bounded recall gate
    "dedup_lsh_recall_report",
]

FLAG = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-parallelism-first")
    qmap = registry.all_queries()
    results = {}
    for name in QUERIES:
        fn = qmap[name]
        a_times, b_times = [], []
        # warmup once (scan cache, codegen) under default
        spark.conf.set(FLAG, "true")
        run_once(spark, fn, sf_dir)
        for _ in range(repeat):
            spark.conf.set(FLAG, "true")
            a_times.append(run_once(spark, fn, sf_dir))
            spark.conf.set(FLAG, "false")
            b_times.append(run_once(spark, fn, sf_dir))
        results[name] = {
            "a_true_med": round(statistics.median(a_times), 3),
            "b_false_med": round(statistics.median(b_times), 3),
            "a_best": round(min(a_times), 3),
            "b_best": round(min(b_times), 3),
        }
        r = results[name]
        print(
            json.dumps({"query": name, **r, "ratio_med": round(r["b_false_med"] / r["a_true_med"], 3)}),
            flush=True,
        )
    tot_a = sum(r["a_true_med"] for r in results.values())
    tot_b = sum(r["b_false_med"] for r in results.values())
    print(json.dumps({"total_a_true": round(tot_a, 2), "total_b_false": round(tot_b, 2), "ratio": round(tot_b / tot_a, 3)}))


if __name__ == "__main__":
    main()
