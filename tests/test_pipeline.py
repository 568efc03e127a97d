"""End-to-end curation pipeline: raw documents -> quality gate ->
near-dup dedup -> split routing -> audited lake tables. Asserts the
retention funnel is consistent with the standalone queries, splits
partition the survivors exactly, and the lake tables carry the
expectation audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_data_lake_spark.pipeline import curate_corpus
from big_data_data_lake_spark.queries import load_all
from big_data_data_lake_spark.sources.metadata import LakeTable

SF = "/root/testdata/sf0.001"
REGISTRY = load_all()


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, SF, out)

    # funnel consistency: quality-gate count equals the funnel query's
    # terminal stage; dedup removes at least the known near-dup pairs
    funnel = {
        r["stage"]: r["n_docs"]
        for r in REGISTRY["curation_funnel"].fn(spark, SF).collect()
    }
    assert stats["stages"]["raw"] == funnel["ingested"]
    assert stats["stages"]["quality_gated"] == funnel["quality_pass"]
    assert stats["stages"]["deduped"] <= stats["stages"]["quality_gated"]

    # splits partition the survivors exactly (no loss, no overlap)
    assert sum(stats["splits"].values()) == stats["stages"]["deduped"]
    ids = {}
    for split in ("train", "val", "test"):
        t = LakeTable(spark, f"{out}/{split}")
        ids[split] = {r.doc_id for r in t.read().select("doc_id").collect()}
        man = t.manifest()
        assert man["expectations"]["mode"] == "drop"
        assert man["partition_by"] == ["lang"]
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])

    # no two survivors in the same output are near-dups of each other
    pairs = REGISTRY["ngram_jaccard_pairs"].fn(spark, SF).collect()
    all_ids = ids["train"] | ids["val"] | ids["test"]
    for r in pairs:
        assert not (r["d1"] in all_ids and r["d2"] in all_ids), (r["d1"], r["d2"])

    # deterministic: a second run routes identically
    stats2 = curate_corpus(spark, SF, str(tmp_path / "curated2"))
    assert stats2 == stats

    # re-running onto the SAME output versions the tables (time travel
    # to the prior snapshot still works) instead of failing
    stats3 = curate_corpus(spark, SF, out)
    assert stats3["versions"] == {s: 1 for s in ("train", "val", "test")}
    assert stats3["splits"] == stats["splits"]
    t = LakeTable(spark, f"{out}/train")
    assert t.read(version=0).count() == t.read(version=1).count()
