"""Aggregations (SURVEY §2.5, A1-A10).

All hash aggregates with map-side partial aggregation — one shuffle on
the group keys, AQE-coalesced. Every helper that feeds an oracle
rounds order-dependent double sums (see queries/__init__ determinism
rules).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k_counts(df: DataFrame, key: str, k: int, count_name: str = "n") -> DataFrame:
    """A1 — value_counts().head(k) (dashboard.py:173-183 etc.).

    Deterministic under ties: secondary order on the key itself.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.col(count_name).desc(), F.col(key).asc())
        .limit(k)
    )


def multi_key_counts(df: DataFrame, keys: Sequence[str], count_col: str = "n") -> DataFrame:
    """A2 — multi-key group count (dashboard.py:229-233)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))


def group_means(df: DataFrame, keys: Sequence[str], cols: Sequence[str], ndigits: int = 2) -> DataFrame:
    """A4 — per-group means of several measures (app.py:78-82)."""
    aggs = [F.round(F.avg(c), ndigits).alias(f"avg_{c}") for c in cols]
    return df.groupBy(*keys).agg(*aggs)


def kpis(df: DataFrame, *exprs: Column) -> DataFrame:
    """A5 — global scalar KPI row (app.py:234-239)."""
    return df.agg(*exprs)


def exact_quantile(df: DataFrame, col: str, q: float) -> DataFrame:
    """A7 — exact quantile (app.py:286-287). Matches DuckDB
    quantile_cont; at 100 TB use percentile_approx instead."""
    return df.select(F.expr(f"percentile({col}, {q})").alias(f"q{int(q * 100)}_{col}"))


def mode_of(df: DataFrame, col: str) -> DataFrame:
    """A8 — most frequent value (app.py:499-511) with deterministic
    tie-break (smallest value wins), unlike pandas ``.mode().iloc[0]``
    which is sort-order luck."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col(col).asc())
        .limit(1)
        .select(col)
    )


def ts_extent(df: DataFrame, ts_col: str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> DataFrame:
    """A9 — min/max event-time banner (app.py:121-137), exported as
    strings so oracles compare textually."""
    return df.agg(
        F.date_format(F.min(ts_col), fmt).alias("min_ts"),
        F.date_format(F.max(ts_col), fmt).alias("max_ts"),
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A10 — sorted distinct domain for filter widgets (app.py:151)."""
    return df.select(col).distinct().orderBy(col)
