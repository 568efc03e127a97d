"""Filters / predicates (SURVEY §2.3, F1-F10).

Each returns a Column predicate (or a filtered DataFrame for the
two-pass quantile filter) so Catalyst can push it into the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def membership(col: Column | str, values: Sequence) -> Column:
    """F1 — isin filter (app.py:215-225)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(list(values))


def airborne(on_ground: Column | str = "on_ground") -> Column:
    """F2 — boolean equality on on_ground (app.py:219,236)."""
    c = F.col(on_ground) if isinstance(on_ground, str) else on_ground
    return ~c


def in_range(col: Column | str, lo, hi) -> Column:
    """F3 — between (app.py:220-222)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.between(lo, hi)


def suspicious_flight(
    on_ground: str = "on_ground",
    velocity: str = "velocity_ms",
    altitude: str = "baro_altitude_m",
    lat: str = "latitude",
    lon: str = "longitude",
) -> Column:
    """F4 — compound OR anomaly predicate (app.py:317-325):
    airborne AND (slow < 30 OR altitude < 0 OR missing coords)."""
    return (~F.col(on_ground)) & (
        (F.col(velocity) < 30)
        | (F.col(altitude) < 0)
        | F.col(lat).isNull()
        | F.col(lon).isNull()
    )


def quantile_threshold(df: DataFrame, col: str, q: float = 0.99) -> DataFrame:
    """F5/M4 — keep rows at or above the q-quantile of ``col``
    (app.py:286-290).

    Two-pass: an exact ``percentile`` aggregate (one shuffle-free
    partial+final agg producing a single row), cross-joined back as a
    broadcast scalar so the filter stays distributed. At 100 TB swap
    ``percentile`` for ``percentile_approx`` — the plan shape is
    unchanged.
    """
    thresh = df.select(F.expr(f"percentile({col}, {q})").alias("__q"))
    return df.join(F.broadcast(thresh)).where(F.col(col) >= F.col("__q")).drop("__q")


def valid_state_vector(arr: Column | str, min_len: int = 17) -> Column:
    """F8 — positional-array validity (consumer.py:172-173)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.size(c) >= min_len
