"""Salted aggregation / join must be algebraically equal to the
unsalted plan — exact same results, skew spread over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_data_lake_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # key "hot" carries 90% of rows
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), (F.col("id") % 13).cast("double").alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 7)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df, "k", {"n": "count(*)", "s": "sum(v)", "mn": "min(v)", "mx": "max(v)"}
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(7)], "k string, label string"
    )
    plain = sorted((r.k, r.v, r.label) for r in fact.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.label) for r in salted_join(fact, dim, "k").collect())
    assert plain == salted
