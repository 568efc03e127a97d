"""Curation-operator semantics beyond the oracle mirror: split
determinism and proportions, sample/split hash independence, leakage
consistency, and the zero-shuffle plan guarantee for row-local
routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_data_lake_spark.plans import inspect as plans
from big_data_data_lake_spark.queries import load_all
from big_data_data_lake_spark.queries.curation import (
    STRATA_RATES,
    TRAIN_PCT,
    VAL_PCT,
)

SF = "/root/testdata/sf0.01"
REGISTRY = load_all()


def test_split_assign_is_shuffle_free(spark):
    """Hash routing is a pure projection: the plan must contain no
    Exchange — the property that makes it free at 100 TB."""
    df = REGISTRY["train_split_assign"].fn(spark, SF)
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)


def test_split_proportions_and_determinism(spark):
    df = REGISTRY["train_split_assign"].fn(spark, SF)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    # 90/5/5 within sampling tolerance at 500 docs
    assert abs(counts["train"] / total - TRAIN_PCT / 100) < 0.05
    assert abs(counts["val"] / total - (VAL_PCT - TRAIN_PCT) / 100) < 0.04
    # deterministic: a second evaluation routes identically
    again = REGISTRY["train_split_assign"].fn(spark, SF)
    assert df.subtract(again).count() == 0 and again.subtract(df).count() == 0


def test_sample_hash_independent_of_split_hash(spark):
    """The stratified-sample keep decision must not correlate with the
    split: within train, the kept fraction stays near the stratum rate
    (a correlated hash would skew it)."""
    from big_data_data_lake_spark.queries.curation import _SAMPLE_MILLE, _rate_case

    splits = REGISTRY["train_split_assign"].fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    joined = docs.join(splits, "doc_id").where(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )
    kept = joined.where(F.expr(f"{_SAMPLE_MILLE} < {_rate_case()}")).count()
    n = joined.count()
    rate = STRATA_RATES["en"] / 1000
    assert abs(kept / n - rate) < 0.08, (kept, n)


def test_leakage_pairs_are_cross_split_near_dups(spark):
    leaks = REGISTRY["split_leakage_pairs"].fn(spark, SF).collect()
    pairs = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in REGISTRY["audit_ngram_jaccard_pairs"].fn(spark, SF).collect()
    }
    splits = {
        r["doc_id"]: r["split"] for r in REGISTRY["train_split_assign"].fn(spark, SF).collect()
    }
    assert leaks, "expected at least one cross-split near-dup at sf0.01"
    for r in leaks:
        assert (r["d1"], r["d2"]) in pairs
        assert splits[r["d1"]] == r["split1"] != r["split2"] == splits[r["d2"]]


def test_funnel_is_monotone_and_anchored(spark):
    rows = {
        r["stage_idx"]: r["n_docs"]
        for r in REGISTRY["curation_funnel"].fn(spark, SF).collect()
    }
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert rows[0] == n_docs
    assert rows[0] >= rows[1] >= rows[2] >= rows[3] >= 0


def test_decontamination_coverage_bounds(spark):
    rows = REGISTRY["benchmark_decontamination"].fn(spark, SF).collect()
    assert rows, "expected flagged contamination at sf0.01"
    for r in rows:
        assert r["doc_id"] % 11 != 0 and r["bench_id"] % 11 == 0
        assert 0.5 <= r["bench_coverage"] <= 1.0
