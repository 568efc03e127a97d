"""Skew mitigation for hot keys (the 100 TB posture, SURVEY §4).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in the session
factory); these helpers cover the two shapes AQE can't fix:

- ``salted_agg``: a high-cardinality aggregate where a handful of keys
  dominate — a single hash shuffle sends every row of a hot key to one
  task. Salting splits each key across N sub-partitions (partial agg),
  then merges the N partials (final agg). Two small shuffles instead
  of one stuck straggler.
- ``salted_join``: fact×dim equi-join with a hot fact key where the
  dim is too big to broadcast — salt the fact key, explode the dim
  row N ways, join on (key, salt).

Both are algebraic rewrites, not samplers: results are exactly equal
to the unsalted plan for any decomposable aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt(n: int) -> Column:
    # deterministic-per-row-batch salt; monotonically_increasing_id is
    # cheap (no shuffle) and uniform mod n within a partition
    return (F.monotonically_increasing_id() % n).cast("int")


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable measures.

    ``aggs`` maps output column -> "fn(expr)" where fn ∈ {count, sum,
    min, max} and expr is any SQL expression (nested parens fine);
    the partial/final split is derived (count→sum of partial counts,
    sum→sum, min→min, max→max).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, rest = spec.split("(", 1)
        fn = fn.strip().lower()
        # strip only the fn's own closing paren, preserving any nested
        # parens inside the expression (e.g. sum(CAST(round(x) AS ...)))
        col = rest[: rest.rfind(")")] if ")" in rest else rest
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(
                F.count(F.lit(1) if col in ("*", "1") else F.expr(col)).alias(p)
            )
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(F.expr(col)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(F.expr(col)).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(F.expr(col)).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec}")
    salted = df.withColumn("__salt", _salt(n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact×dim equi-join: fact rows get a random salt, dim
    rows are exploded to all salts, the join key becomes (key, salt) —
    a hot fact key now spreads over ``n_salts`` tasks. Dim grows by
    ``n_salts``×, so use only when the dim can't broadcast but is
    still ≪ fact."""
    f = fact.withColumn("__salt", _salt(n_salts))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, on=[key, "__salt"], how=how).drop("__salt")
