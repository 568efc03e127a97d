"""Query-scoped executor-storage management.

Several registered queries persist intermediate DataFrames whose
reuse is load-bearing (inverted-index explodes, sketch self-joins:
without the cache, ``Generate`` re-evaluates the unmaterialized hash
lineage once per output row). Because the registry contract returns a
LAZY DataFrame that the caller collects later, those caches cannot be
released inside the query function — the collect still needs them.

``scoped_persist`` registers each such cache; ``release_query_caches``
frees every cache registered since the last release. The registry
adapter (``__spark_entry__``) and ``bench.py`` call it at each query
boundary, so a long-lived session holds at most ONE query's caches at
a time instead of accumulating storage forever (the leak ADVICE r2
flagged). Composed queries (e.g. ``semantic_dedup_crosscheck``, which
reuses two other queries' plans) work because release happens only at
top-level query boundaries, never inside a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release at the next query boundary."""
    df.persist()
    _SCOPED.append(df)
    return df


def release_query_caches() -> int:
    """Unpersist every scoped cache; returns how many were released.
    Safe to call even if a previous query's DataFrame is collected
    later — Spark recomputes from lineage (slower, never wrong)."""
    n = 0
    while _SCOPED:
        _SCOPED.pop().unpersist()
        n += 1
    return n
