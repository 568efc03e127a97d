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


def exact_sum_units(col: Column | str, scale: int = 100, wide: bool = False) -> Column:
    """``sum(units)`` — the exact integer accumulator, un-rescaled.

    Default accumulator is ``long``: exact below 2^63 units, and under
    this engine's ANSI mode (Spark 4 default) an overflow is a LOUD
    ``ARITHMETIC_OVERFLOW`` error — never a silently wrong answer
    (the round-9 advice assumed non-ANSI silent wraparound, which
    this session never runs; ``tests/test_properties.py::
    test_exact_sum_survives_past_long_range`` pins the behavior).
    Per-call ceilings: scale=100 on ~1e5-dollar values is ~1e7
    units/row -> >9e11 rows per GROUP before the bound (a 100 TB
    lineitem's GLOBAL cent-sum is ~2e18, inside it); scale=10000
    global sums cross it around 1e12 rows — for those call sites pass
    ``wide=True`` to accumulate in DECIMAL(38,0) (exact to 1e38,
    overflow-checked). Decimal is NOT the default because it is not
    free: measured 1.9x on the Q1 aggregation stage (sf0.1, medians
    0.77 s long vs 1.47 s decimal after JIT warm-up — the first,
    JIT-contaminated A/B read "free" and briefly shipped decimal
    everywhere in r10; SCALE.md r10 records the honest numbers).
    DuckDB's ``sum(BIGINT)`` is HUGEINT either way, so oracle SQL is
    identical for both accumulators."""
    u = units(col, scale)
    return F.sum(u.cast("decimal(38,0)") if wide else u)


def exact_sum(
    col: Column | str, scale: int = 100, dec: int = 2, wide: bool = False
) -> Column:
    """Order-invariant ``round(sum(col), dec)`` for fixed-decimal cols.

    The unit sum divided by a float literal promotes to DOUBLE —
    bit-identical to DuckDB's ``sum(BIGINT) / 100.0`` (HUGEINT ->
    double) on both accumulators (see exact_sum_units for the
    long-vs-decimal trade)."""
    return F.round(exact_sum_units(col, scale, wide) / F.lit(float(scale)), dec)


def exact_avg(
    col: Column | str, scale: int = 100, dec: int = 2, wide: bool = False
) -> Column:
    """Order-invariant ``round(avg(col), dec)``: exact integer-unit sum
    divided by the non-null count (matching ``avg`` null semantics),
    rescaled once. Division order mirrors ``sql_exact_avg`` exactly:
    (sum -> double) / count / scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        exact_sum_units(c, scale, wide)
        / F.count(c).cast("double")
        / F.lit(float(scale)),
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
