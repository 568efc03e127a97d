"""End-to-end training-corpus curation: the composition every
operator family in this engine exists to serve. One call takes a raw
document table to audited, versioned, split train/val/test lake
tables:

    documents
      -> quality gate      (row-local: lang-ID agreement, length
                            floor, quality floor — one scan)
      -> near-dup dedup    (inverted-index pairs -> connected
                            components -> cluster representatives)
      -> split routing     (deterministic hash, zero-shuffle)
      -> 3x LakeTable      (partitioned by lang, write expectations
                            enforced, violation audit in the manifest)

Scale shape: the only data-scale shuffles are the dedup family's
bounded equi-joins and the per-split writes' partitioning; every gate
and the split routing are pure projections. The returned stats are
all metadata-scale (manifest row counts, single-row aggregates) — the
pipeline never collects data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import text as tx
from .queries.curation import MIN_QUALITY, MIN_TOKENS, _SPLIT_BUCKET, _split_case
from .queries.corpus import dedup_clusters
from .sources.catalog import load_table
from .sources.metadata import LakeTable

SPLITS = ("train", "val", "test")


def quality_gate(docs: DataFrame) -> DataFrame:
    """The curation_funnel gates as a filter: language-ID agreement,
    token floor, quality floor — one row-local scan."""
    return (
        docs.withColumn("__pred", tx.lang_id("text"))
        .withColumn("__ntok", tx.token_count("text"))
        .withColumn("__q", F.round(tx.quality_score("text"), 4))
        .where(
            (F.col("__pred") == F.col("lang"))
            & (F.col("__ntok") >= MIN_TOKENS)
            & (F.col("__q") >= MIN_QUALITY)
        )
        .drop("__pred", "__ntok", "__q")
    )


def dedup_survivor_docs(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Keep one representative per near-dup cluster. The cluster
    labels come from the same connected-components propagation the
    dedup_clusters query runs — over the RAW corpus — but the
    representative is the minimum doc_id among the GATED members of
    each cluster: picking the raw-corpus minimum would silently drop
    entire clusters whenever their minimum happened to fail the
    quality gate (the gated members would semi-join against a
    representative that no longer exists). The survivor pick is one
    aggregation over the gated ids plus a semi-join — broadcast-sized
    at test SF, co-partitioned equi-joins at scale."""
    return survivor_filter(docs, dedup_clusters(spark, sf_dir))


def survivor_filter(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Pure survivor pick: min doc_id per cluster AMONG ``docs``' own
    rows (not the raw corpus), then a semi-join back."""
    gated_clusters = docs.select("doc_id").join(clusters, "doc_id")
    survivors = (
        gated_clusters.groupBy("cluster")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(survivors, "doc_id", "left_semi")


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    expectations: dict[str, str] | None = None,
) -> dict:
    """Run the full curation pipeline; returns the audit dict a
    pipeline run would log: per-stage retention counts, per-split row
    counts, and the committed lake-table versions."""
    rules = expectations or {
        "doc_id_set": "doc_id IS NOT NULL",
        "text_set": "text IS NOT NULL AND length(text) > 0",
    }
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    gated = quality_gate(docs).persist()
    deduped = None
    try:
        n_gated = gated.count()

        deduped = dedup_survivor_docs(spark, sf_dir, gated).persist()
        n_deduped = deduped.count()

        routed = deduped.withColumn("split", F.expr(_split_case(_SPLIT_BUCKET)))
        stats: dict = {
            "stages": {"raw": n_raw, "quality_gated": n_gated, "deduped": n_deduped},
            "splits": {},
            "versions": {},
        }
        for split in SPLITS:
            part = routed.where(F.col("split") == split).drop("split")
            table = LakeTable(spark, f"{out_dir}/{split}")
            # re-runs version the table (overwrite keeps prior snapshots
            # readable) instead of failing on an existing output
            if table.versions():
                v = table.overwrite(part, expectations=rules, expect_mode="drop")
            else:
                v = table.create(
                    part, partition_by=["lang"], expectations=rules, expect_mode="drop"
                )
            stats["splits"][split] = table.row_count()
            stats["versions"][split] = v
        return stats
    finally:
        # a long-lived service calls this repeatedly — leaked caches
        # would accumulate until they evict useful storage memory
        gated.unpersist()
        if deduped is not None:
            deduped.unpersist()
