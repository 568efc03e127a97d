"""Exact fixed-decimal aggregation — the order-invariant rewrite of
``round(sum(double), 2)`` money/value aggregates.

Why this exists (round-8 verdict, finding #2): every monetary column
in the corpus is exactly 2-decimal (prices, discounts, event values),
so ``sum(double)`` is summing values that are each within one float
ulp of a multiple of 0.01 — but IEEE addition is not associative, so
the ~1e-13 accumulated drift depends on partition layout and engine.
``round(sum, 2)`` then flips the final cent whenever the true sum
lands on a round-half boundary. The sf1 parity sweep caught three
real instances of this (``unigram_surprisal``, ``bigram_surprisal``,
TPC-H Q9) invisible at sf0.01.

The fix: round each ROW to integer units (cents for bare 2-decimal
columns; 1e-4-dollar units for 2-decimal x 2-decimal products like
``l_extendedprice * (1 - l_discount)``), sum as ``long`` — exact
integer arithmetic, order-invariant across layouts and engines — and
rescale once at the end. The per-row round is stable cross-engine
because a 2-decimal value times 100 is ~1e-10 from an integer, never
near a .5 boundary, and the float product itself is bit-identical
under IEEE-754 on both engines.

Each Spark helper has a same-named SQL twin so query and DuckDB
oracle state the identical arithmetic.

At 100 TB this also REMOVES a failure mode: long sums never lose
precision below 9.2e18 units (= $9.2e14 at 1e-4 units), while a
double sum silently degrades past 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "units",
    "exact_sum",
    "exact_avg",
    "exact_sum_units",
    "sql_units",
    "sql_exact_sum",
    "sql_exact_avg",
]


def units(col: Column | str, scale: int = 100) -> Column:
    """Per-row integer units: ``round(col * scale) AS long``.

    ``scale=100`` → cents for 2-decimal columns; ``scale=10000`` →
    1e-4-dollar units for products of two 2-decimal terms.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale), 0).cast("long")


def exact_sum_units(col: Column | str, scale: int = 100) -> Column:
    """``sum(units)`` — the exact integer accumulator, un-rescaled.

    Accumulates as ``long``: exact below 2^63 units. Callers that EMIT
    this column (``*_cents`` outputs) are schema-pinned to BIGINT
    against their oracles; each such call site's row-count ceiling is
    ~9.2e18 / max_units_per_row (>= 9e11 rows even at 1e7 units/row —
    a 100 TB lineitem). The rescaling aggregates below, which dominate
    the ~96 money call sites, accumulate in DECIMAL(38,0) instead and
    carry no ceiling at any reachable scale (round-9 advice: Spark
    wraps long sums silently past 2^63 in non-ANSI mode)."""
    return F.sum(units(col, scale))


def _exact_sum_units_wide(col: Column | str, scale: int) -> Column:
    """``sum(units)`` accumulated in DECIMAL(38,0) — exact to 1e38
    units, overflow-checked (NULL, never silent wraparound). The
    measured cost vs the long accumulator is nil (sf0.1 lineitem A/B:
    within noise), so every rescaling aggregate uses this form.
    DuckDB's twin ``sum(BIGINT)`` already accumulates in HUGEINT
    (int128), so the oracle SQL needs no change."""
    return F.sum(units(col, scale).cast("decimal(38,0)"))


def exact_sum(col: Column | str, scale: int = 100, dec: int = 2) -> Column:
    """Order-invariant ``round(sum(col), dec)`` for fixed-decimal cols.

    The decimal-unit sum divided by a float literal promotes to
    DOUBLE — bit-identical to DuckDB's ``sum(BIGINT) / 100.0``
    (HUGEINT -> double) on every path, including sums past 2^53 where
    both engines round the exact integer to the same nearest double.
    """
    return F.round(_exact_sum_units_wide(col, scale) / F.lit(float(scale)), dec)


def exact_avg(col: Column | str, scale: int = 100, dec: int = 2) -> Column:
    """Order-invariant ``round(avg(col), dec)``: exact decimal-unit sum
    divided by the non-null count (matching ``avg`` null semantics),
    rescaled once. Division order mirrors ``sql_exact_avg`` exactly:
    (sum -> double) / count / scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        _exact_sum_units_wide(c, scale) / F.count(c).cast("double") / F.lit(float(scale)),
        dec,
    )


def sql_units(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`units`."""
    return f"CAST(round(({expr}) * {scale}, 0) AS BIGINT)"


def sql_exact_sum(expr: str, scale: int = 100, dec: int = 2) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return f"round(sum({sql_units(expr, scale)}) / {float(scale)}, {dec})"


def sql_exact_avg(expr: str, scale: int = 100, dec: int = 2) -> str:
    """DuckDB twin of :func:`exact_avg` — ``count({expr})`` keeps
    ``avg`` null semantics."""
    return (
        f"round(sum({sql_units(expr, scale)})"
        f" / CAST(count({expr}) AS DOUBLE) / {float(scale)}, {dec})"
    )
