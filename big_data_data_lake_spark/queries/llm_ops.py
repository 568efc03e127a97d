"""LLM-data-pipeline queries (SURVEY §7 Phase 4) over ``documents``
and ``embeddings``: dedup, text analysis, similarity. Every operator
here is the row-parallel or one-shuffle shape that survives 100 TB —
no driver-side loops, no quadratic blowup without an explicit
candidate-pruning stage first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as tx
from ..operators import windows as win
from ..sources.catalog import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

DEDUP_EXACT_ORACLE = """
SELECT doc_id, lang, source
FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
"""


@register("dedup_exact", DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, deterministic survivor (lowest doc_id per text).

    One hash shuffle on the text (at 100 TB: on a 64-bit content
    fingerprint instead, so the shuffle moves 8-byte keys, not bodies).
    """
    docs = _t(spark, sf_dir, "documents")
    return win.first_per_key(docs, "text", "doc_id").select("doc_id", "lang", "source")


FINGERPRINT_DEDUP_ORACLE = f"""
WITH fp AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % {tx.FINGERPRINT_MOD}
           ) AS fp
    FROM documents
)
SELECT doc_id, fp
FROM (SELECT doc_id, fp, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp)
WHERE rn = 1
"""


@register("fingerprint_dedup", FINGERPRINT_DEDUP_ORACLE)
def fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint dedup: rolling polynomial hash per document,
    survivors = lowest doc_id per fingerprint. This is the scale path
    for exact dedup — the shuffle key is 8 bytes instead of the body."""
    docs = _t(spark, sf_dir, "documents").withColumn("fp", tx.fingerprint("text"))
    return win.first_per_key(docs, "fp", "doc_id").select("doc_id", "fp")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

TOKEN_STATS_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(string_split(text, ' '), t -> CAST(len(t) AS BIGINT))),
                 (a, b) -> a + b) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS avg_token_len
FROM documents
"""


@register("token_stats", TOKEN_STATS_ORACLE)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace) + vocabulary stats per document —
    array higher-order functions, fully codegen'd, row-parallel."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.distinct_token_count("text").alias("n_distinct"),
        F.round(tx.avg_token_len("text"), 4).alias("avg_token_len"),
    )


QUALITY_SCORE_ORACLE = """
WITH t AS (
    SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
)
SELECT lang,
       round(avg(
           least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.5
           + CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) * 0.5
       ), 4) AS avg_quality,
       count(*) AS n_docs
FROM t
GROUP BY lang
ORDER BY lang
"""


@register("quality_scores", QUALITY_SCORE_ORACLE)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (length saturation + stopword density),
    profiled per language."""
    docs = _t(spark, sf_dir, "documents").withColumn("q", tx.quality_score("text"))
    return (
        docs.groupBy("lang")
        .agg(
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


LANG_CONFUSION_ORACLE = """
WITH scored AS (
    SELECT lang,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['the', 'a', 'and', 'of', 'to'])) AS s_en,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['el', 'la', 'de', 'que', 'y'])) AS s_es,
           len(list_intersect(list_distinct(string_split(text, ' ')),
                              ['le', 'la', 'de', 'et', 'un'])) AS s_fr
    FROM documents
)
SELECT lang,
       CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS pred_lang,
       count(*) AS n
FROM scored
GROUP BY 1, 2
ORDER BY lang, pred_lang
"""


@register("lang_id_confusion", LANG_CONFUSION_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-anchor argmax) cross-tabulated
    against the labeled language."""
    docs = _t(spark, sf_dir, "documents").withColumn("pred_lang", tx.lang_id("text"))
    return (
        docs.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


TOP_TERMS_ORACLE = """
SELECT lang, token, n
FROM (
    SELECT lang, token, count(*) AS n,
           row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS rn
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY lang, token
)
WHERE rn <= 5
"""


@register("top_terms_by_lang", TOP_TERMS_ORACLE)
def top_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-terms (A1 over exploded tokens): explode → two-key
    count → top-5 per group. The explode keeps rows wide-partitioned;
    the count is partial-aggregated before its single shuffle."""
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select("lang", F.explode(tx.tokenize("text")).alias("token"))
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    return win.topk_per_group(counts, ["lang"], "n", k=5, tiebreak="token").select(
        "lang", "token", "n"
    )
