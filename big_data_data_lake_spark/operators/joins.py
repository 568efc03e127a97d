"""Joins (SURVEY §2.4, J1-J3) plus the semi/anti extensions.

Scale posture: the reference's only join is fact x small-dimension —
always broadcast the dimension (no shuffle of the 100 TB side). The
fact side keeps its partitioning, so downstream aggregations reuse it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    how: str = "left",
    dedup_dim: bool = True,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2 — broadcast left equi-join against a dimension
    (process_silver.py:111; consumer.py:88-98).

    ``dedup_dim=True`` pins the reference's ``iloc[0]`` semantic
    (consumer.py:91-94): with duplicate dimension keys the first match
    wins, so the dimension is reduced to one row per key *before* the
    join — otherwise a left join would fan out fact rows.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if dedup_dim:
        dim = dim.dropDuplicates(keys)
    if broadcast_dim:
        dim = F.broadcast(dim)
    return fact.join(dim, on=keys, how=how)


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """J3 — pd.concat equivalent (dashboard.py:65); by-name union so
    column order differences across files can't silently misalign."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def semi(fact: DataFrame, other: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of fact with a match (extension per SURVEY §2.4)."""
    keys = [key] if isinstance(key, str) else list(key)
    return fact.join(other, on=keys, how="left_semi")


def anti(fact: DataFrame, other: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of fact without a match."""
    keys = [key] if isinstance(key, str) else list(key)
    return fact.join(other, on=keys, how="left_anti")
