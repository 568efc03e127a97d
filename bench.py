"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": <float>}

Queries execute to a noop sink so the full plan runs (scan → shuffle →
result) without driver-side materialization skewing the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_data_lake_spark.queries import load_all
from big_data_data_lake_spark.session import get_spark

# Headline set: one per operator family (scan/agg, joins, windows,
# quantiles, trig, sessionization, time windows, dedup x3, similarity
# x2, text, multimodal).
HEADLINE = [
    "country_intelligence",
    "pricing_summary",
    "brand_revenue",
    "topk_orders_per_segment",
    "latest_event_per_user",
    "asof_last_error",
    "range_band_join",
    "quantile_outliers",
    "dead_reckoning",
    "sessionize_events",
    "tumbling_hourly_counts",
    "sliding_hourly_counts",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_capped",
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "embedding_topk_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "token_stats",
    "multimodal_features",
    "benchmark_decontamination",
    "shipping_priority",
    "audio_triage",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    registry = load_all()

    # Warm the JVM/codegen path and the (long-lived) Python worker
    # pool once so timings measure the queries, not process startup
    # (standard benchmark practice; every query still runs cold
    # w.r.t. its own data — nothing is cached).
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    def _noop_batches(batches):
        yield from batches

    spark.range(cpus).repartition(cpus).mapInPandas(
        _noop_batches, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # each query's own persisted intermediates are inside its
        # timing; drop them afterwards so no query reuses (or pays GC
        # pressure for) another's cache — every timing is cold-data
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
