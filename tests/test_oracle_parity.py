"""The local mirror of the driver's correctness gate: every registered
query runs on Spark and (when an oracle exists) on DuckDB over the
same sf0.001 parquet; results must match on schema, row count, and
values exactly.
"""

from __future__ import annotations

import pytest

from big_data_data_lake_spark.queries import load_all
from big_data_data_lake_spark.testing import check_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    issues = check_query(spark, name)
    assert not issues, f"{name}: " + "; ".join(issues)


def test_every_query_has_docstring():
    for name, qd in REGISTRY.items():
        assert qd.doc, f"{name} lacks a docstring"


def test_lsh_pr_keep_matches_sql_twin_at_every_size():
    """The r10 absolute-budget audit gate: Python's integer ceildiv
    (_lsh_pr_keep) and the oracle's scalar-subquery SQL must produce
    the IDENTICAL keep threshold at any corpus size — a divergence
    would sample different docs on the two engines and fail parity in
    a way that depends on corpus size, not code. Checked over the
    real tier sizes and adversarial neighbors (divisors, off-by-one,
    empty corpus)."""
    import duckdb

    from big_data_data_lake_spark.queries.corpus import (
        LSH_PR_DOC_BUDGET,
        LSH_PR_SAMPLE_KEEP,
        LSH_PR_SAMPLE_MOD,
        _lsh_pr_keep,
    )

    sql = (
        f"SELECT least({LSH_PR_SAMPLE_KEEP}, "
        f"({LSH_PR_SAMPLE_MOD} * {LSH_PR_DOC_BUDGET} + greatest(n, 1) - 1) "
        f"// greatest(n, 1)) FROM (SELECT ? AS n)"
    )
    for n in (0, 1, 2, 7, 499, 500, 5000, 5001, 17_500, 50_000,
              500_000, 1_750_000, 1_750_001, 10**9, 10**12):
        got_sql = duckdb.sql(sql.replace("?", str(n))).fetchone()[0]
        assert _lsh_pr_keep(n) == got_sql, (n, _lsh_pr_keep(n), got_sql)
    # the cap binds at and below sf0.1 — attested results unchanged
    assert _lsh_pr_keep(500) == 350 and _lsh_pr_keep(5000) == 350
    # budget holds above: ~1750-2000 docs at any larger corpus
    for n in (50_000, 500_000, 5_000_000):
        kept = n * _lsh_pr_keep(n) / 1000
        assert LSH_PR_DOC_BUDGET <= kept <= LSH_PR_DOC_BUDGET + n / 1000, (n, kept)
