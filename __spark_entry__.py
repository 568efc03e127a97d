"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (and the §7 LLM-pipeline extensions) for the
driver's DuckDB correctness gate at sf0.01.

Implementations live in ``big_data_data_lake_spark/queries/``; this
module is a thin adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_data_lake_spark.queries import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Pin the session settings the engine assumes (UTC, nanos-as-long
    reads for the events table) on a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query ("country intelligence", SURVEY §7 Phase 1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    registry = load_all()
    return registry["country_intelligence"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_all()

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            # query boundary: free the PREVIOUS query's scoped caches so
            # a long-lived session never accumulates executor storage
            from big_data_data_lake_spark.caching import release_query_caches

            release_query_caches()
            return registry[name].fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in registry}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators → rows-only check)."""
    registry = load_all()
    return {name: qd.oracle for name, qd in registry.items() if qd.oracle is not None}
