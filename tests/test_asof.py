"""Unit tests for the as-of join operator (merge formulation) on tiny
literal frames: backward match, equal-timestamp inclusion (<=),
no-match nulls, and deterministic tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_data_lake_spark.operators.joins import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "id long, k string, ts long")
    right = spark.createDataFrame(right_rows, "k string, ts long, v double")
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tiebreak="v",
    )
    return {r["id"]: (r["asof_v"], r["asof_ts"]) for r in out.collect()}

def test_backward_match_picks_latest_prior(spark):
    got = _run(
        spark,
        [(1, "a", 100), (2, "a", 250)],
        [("a", 50, 1.0), ("a", 200, 2.0), ("a", 300, 3.0)],
    )
    assert got[1] == (1.0, 50)
    assert got[2] == (2.0, 200)


def test_equal_timestamp_matches(spark):
    got = _run(spark, [(1, "a", 200)], [("a", 200, 7.0)])
    assert got[1] == (7.0, 200)


def test_no_prior_row_yields_nulls(spark):
    got = _run(spark, [(1, "a", 10), (2, "b", 10)], [("a", 50, 1.0)])
    assert got[1] == (None, None)
    assert got[2] == (None, None)


def test_tie_on_right_ts_takes_max_tiebreak(spark):
    got = _run(
        spark,
        [(1, "a", 300)],
        [("a", 200, 5.0), ("a", 200, 9.0), ("a", 200, 1.0)],
    )
    assert got[1] == (9.0, 200)


def test_keys_do_not_leak_across_partitions(spark):
    got = _run(
        spark,
        [(1, "a", 100), (2, "b", 100)],
        [("a", 90, 1.0), ("b", 95, 2.0)],
    )
    assert got[1] == (1.0, 90)
    assert got[2] == (2.0, 95)


def _run_dir(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "id long, k string, ts long")
    right = spark.createDataFrame(right_rows, "k string, ts long, v double")
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tiebreak="v", **kw,
    )
    return {r["id"]: (r["asof_v"], r["asof_ts"]) for r in out.collect()}


def test_forward_match_picks_earliest_following(spark):
    got = _run_dir(
        spark,
        [(1, "a", 100), (2, "a", 250)],
        [("a", 50, 1.0), ("a", 200, 2.0), ("a", 300, 3.0)],
        direction="forward",
    )
    assert got[1] == (2.0, 200)
    assert got[2] == (3.0, 300)


def test_forward_equal_ts_matches_and_tie_takes_min(spark):
    got = _run_dir(
        spark,
        [(1, "a", 200)],
        [("a", 200, 5.0), ("a", 200, 4.0), ("a", 400, 9.0)],
        direction="forward",
    )
    assert got[1] == (4.0, 200)  # >= includes equal ts; min tiebreak wins


def test_forward_no_following_row_yields_nulls(spark):
    got = _run_dir(
        spark,
        [(1, "a", 500)],
        [("a", 50, 1.0)],
        direction="forward",
    )
    assert got[1] == (None, None)


def test_tolerance_nulls_distant_matches(spark):
    got = _run_dir(
        spark,
        [(1, "a", 100), (2, "a", 1000)],
        [("a", 90, 1.0), ("a", 50, 2.0)],
        tolerance=20,
    )
    assert got[1] == (1.0, 90)      # 10 units away: inside tolerance
    assert got[2] == (None, None)   # 910 away: match nulled, row kept


def test_tolerance_with_timestamp_columns(spark):
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:10:00")], "id long, k string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 7.0)], "k string, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=601.0,
    )
    assert out.collect()[0]["asof_v"] == 7.0  # 600 s away, inside 601 s
    out2 = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=599.0,
    )
    assert out2.collect()[0]["asof_v"] is None


def test_direction_validation(spark):
    import pytest

    left = spark.createDataFrame([(1, "a", 1)], "id long, k string, ts long")
    with pytest.raises(ValueError):
        asof_join(left, left, key="k", left_ts="ts", right_ts="ts",
                  value_cols=["id"], direction="nearest")
