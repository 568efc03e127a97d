"""Window-function operators: latest-per-key dedup (batch F9), top-k
per group, running aggregates, sessionization.

The reference's only windowed semantic is the producer's latest-wins
dedup (producer.py:89-96); the rest are the standard analytic
extensions SURVEY §2.10 flags as free in Spark. All shuffle once on
the partition key and are AQE-coalesced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """F9 (batch) — keep the row with max ``order_col`` per key
    (producer.py:89-96 keeps max last_contact).

    ``tiebreak`` makes the winner deterministic when ``order_col``
    ties — the reference's dict overwrite is arrival-order dependent,
    an ambiguity this port resolves explicitly (SURVEY §7 risk 1).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
) -> DataFrame:
    """J2's ``iloc[0]`` semantic (consumer.py:91-94): one deterministic
    row per key, lowest ``order_col`` wins."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number — one shuffle, partial
    top-k applied map-side by the window sort."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def running_sum(df: DataFrame, keys: Sequence[str], order_col: str, value_col: str, out: str = "running") -> DataFrame:
    """Cumulative sum per key in event order."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value_col).over(w))


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. lag + cumulative sum —
    two window passes over one shuffle partitioning."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
