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


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join split must actually fire on this build (r4
    verdict item: salted_agg/salted_join had oracle parity but nothing
    attested AQE's own handling). A zipfian fact x fact sort-merge
    join with one key holding ~95% of rows, thresholds lowered to test
    scale: the executed adaptive plan must carry the skew=true marker
    (the hot partition was split across tasks) and results must equal
    the unsplit join. Guidance on AQE-split vs salting lives in
    CLUSTER.md §Skew."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    # force sort-merge: skew split never applies to a broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # payload must be HIGH-ENTROPY and non-constant: a literal pad
        # constant-folds out of the shuffle entirely, and repeated
        # strings lz4-compress below the skew threshold (map output
        # sizes are COMPRESSED bytes — the first version of this test
        # never tripped the detector for exactly that reason)
        pad = F.md5(F.col("id").cast("string"))
        # ~60k rows on key 'hot' (~2 MB compressed), 50 cold keys
        left = spark.range(63_000).select(
            F.when(F.col("id") % 21 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("c"), F.col("id") % 50))
            .alias("k"),
            pad.alias("payload"),
            F.col("id").alias("lid"),
        )
        # one row per key, built WITHOUT an aggregate: OptimizeSkewedJoin
        # only matches SMJ(Sort(ShuffleRead), Sort(ShuffleRead)) — an
        # agg between shuffle and sort makes the stage non-replicable
        # and silently disqualifies the split
        right = spark.range(51).select(
            F.when(F.col("id") == 50, F.lit("hot"))
            .otherwise(F.concat(F.lit("c"), F.col("id") % 50))
            .alias("k"),
            (F.col("id") % 97).alias("rv"),
        )
        joined = left.join(right, "k")
        # collect() executes THIS Dataset's QueryExecution (count()
        # would wrap a new one and leave this plan isFinalPlan=false)
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
        # algebraic equality with the plain (pre-AQE-split) semantics:
        # every left row with a matching key survives exactly once
        assert n == left.join(F.broadcast(right), "k").count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
