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
