"""SparkSession factory with scale-aware defaults.

The reference runs five single-threaded pandas processes; here one
SparkSession hosts the whole engine. Local-mode settings below mirror
what the cluster profile would pin per-executor:

- AQE on (runtime partition coalescing + skew-join splitting) so the
  same plans survive 100x data growth without re-tuning.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a higher initial number.
- Session timezone pinned to UTC: the reference compares epoch-seconds
  timestamps (services/analytics/app.py:118-137) and the DuckDB oracle
  is UTC-naive — everything here is wall-clock UTC.
- Arrow enabled for the few Pandas-UDF paths (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "big_data_data_lake_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # Shuffle partitions must be sized to DATA VOLUME, not fixed:
        # measured 2x faster at 4x cores on 10x data (the sf1
        # inverted-index join spills at core-count partitions), but
        # 2-3x SLOWER at calibration SF (persisted intermediates keep
        # the inflated partitioning — AQE coalesces shuffle reads, not
        # caches or explicit repartitions). Default matches the cores
        # for the per-round SF; the 10x sweep raises it via
        # $SPARK_GRAFT_SHUFFLE_PARTITIONS — the same knob a cluster
        # operator turns with the dataset.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
        ) or max(cpus, 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-partition CACHED plans too (default false). The
        # engine persists hot intermediates (scoped_persist: inverted
        # indexes, sketch tables); with the default, every cached plan
        # is pinned to the INITIAL shuffle-partition count and exempt
        # from AQE coalescing — at sf1's volume-sized 128 partitions
        # the cache-heavy corpus aggregates paid 3-4x scheduling/
        # small-block overhead (r10 root-cause of the chronic
        # dsir/bigram "in-bench movers": dsir 20.0s -> 7.6s, bigram
        # 8.4s -> 6.2s median at sp=128 with this on; SCALE.md r10).
        # The trade (Spark disables it by default so cached output
        # partitioning stays reusable deterministically) does not
        # bind here: every consumer re-shuffles on its own keys or
        # aggregates, and the registry's layout-invariance sweep
        # attests results are partitioning-independent.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The lake's event stream lands with nanosecond timestamps
        # (parquet TIMESTAMP(NANOS)), which vanilla Spark rejects. Read
        # them as raw nanos; the catalog re-types to microsecond
        # timestamps (sources/catalog.py) — same truncation DuckDB does.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Testdata parquet carries naive timestamp[us] (isAdjustedToUTC
        # = false). Spark 4 would infer TIMESTAMP_NTZ, which breaks
        # epoch functions (unix_micros & co. take LTZ only). With the
        # session timezone pinned UTC above, reading them as plain
        # TIMESTAMP is bit-identical to DuckDB's naive semantics.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Spark's production default (10 MB). Rounds 1-8 raised this to
        # 256 MB for the fat single box; round-9 A/B measurements
        # killed that tuning: at 10 MB the 15 optimizer-promoted
        # fact-side broadcasts resolve to the shuffle joins the query
        # docstrings describe, and the monitored set runs 2-9x FASTER
        # at sf10, 20% faster at sf1, and even at sf0.1 (SCALE.md,
        # round-9 A/B). It also caused the Q4 cliff
        # (late_order_priority_counts, 4.6x standalone). Matching the
        # production default means local plan shapes ARE the cluster
        # plan shapes. Explicit broadcast() hints still pin every
        # known-small dimension regardless of the threshold;
        # $SPARK_GRAFT_BROADCAST_THR overrides for experiments.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get(
                "SPARK_GRAFT_BROADCAST_THR", str(10 * 1024 * 1024)
            ),
        )
        .config("spark.ui.enabled", "false")
        # local mode runs every task thread inside the driver JVM — size
        # the heap for all of them, not for a lone driver process
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
