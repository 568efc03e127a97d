"""A/B: single-chunk pigeonhole banding vs combination banding for the
SimHash candidate join (r10 verdict #3 — simhash_dup_summary cost
71.6 s at sf10 because 8-bit chunk slots bucket 500k docs ~2k per
cell). Runs BOTH candidate-generation forms over the same persisted
sketches at a given SF dir, bench-faithful config, best-of-N, and
prints per-form seconds + survivor-pair count (must be EQUAL — both
forms are exact by pigeonhole).

Usage:
    python tools/ab_simhash_banding.py [--sf-dir .bench/sf10] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".bench/sf10")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from bench import _auto_shuffle_partitions
    from big_data_data_lake_spark.caching import (
        release_query_caches,
        scoped_persist,
    )
    from big_data_data_lake_spark.operators import dedup as dd
    from big_data_data_lake_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_simhash", cpus=cpus)
    parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
    ) or _auto_shuffle_partitions(args.sf_dir, cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    def sketches():
        return scoped_persist(
            docs.selectExpr("doc_id", dd.spark_token_hashes_expr() + " AS th")
            .selectExpr("doc_id", dd.spark_shingle_hashes_expr(2) + " AS hs")
            .selectExpr("doc_id", dd.spark_widened_hashes_expr() + " AS wh")
            .selectExpr("doc_id", dd.spark_simhash_expr() + " AS h")
        )

    def pairs_from(sig, expl, kcols):
        keyed = sig.select("doc_id", "h", F.explode(expl).alias("k")).select(
            "doc_id", "h", *[F.col(f"k.{c}").alias(c) for c in kcols]
        )
        a = keyed.select(
            F.col("doc_id").alias("d1"), F.col("h").alias("h1"), *kcols
        )
        b = keyed.select(
            F.col("doc_id").alias("d2"), F.col("h").alias("h2"), *kcols
        )
        ham = dd.hamming64(F.col("h1"), F.col("h2"))
        return (
            a.join(b, kcols)
            .where(
                (F.col("d1") < F.col("d2"))
                & (ham <= dd.SIMHASH_HAMMING_BUDGET)
            )
            .select("d1", "d2", ham.cast("int").alias("hamming"))
            .dropDuplicates(["d1", "d2"])
        )

    forms = {
        "chunk_7x8bit": lambda sig: pairs_from(
            sig, dd.simhash_chunks(F.col("h")), ["ci", "cv"]
        ),
        "combo_2of8_14bit": lambda sig: pairs_from(
            sig, dd.simhash_combo_keys(F.col("h")), ["ki", "kv"]
        ),
        # the documented >16M-doc escalation (r11 verdict #5): 6-bit
        # blocks, C(9,3)=84 combos, 18-bit keys — 16x smaller buckets
        # than B=8 for 3x the explode rows; exact by the same
        # pigeonhole (Hamming <= 6 on 9 blocks leaves >= 3 agreeing)
        "combo_3of9_18bit": lambda sig: pairs_from(
            sig, dd.simhash_combo_keys(F.col("h"), n_blocks=9), ["ki", "kv"]
        ),
    }
    out: dict[str, dict] = {}
    for name, make in forms.items():
        best, n_pairs = float("inf"), None
        for _ in range(args.reps):
            sig = sketches()
            t0 = time.perf_counter()
            n_pairs = make(sig).count()
            best = min(best, time.perf_counter() - t0)
            release_query_caches()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = {"sec": round(best, 1), "pairs": n_pairs}
        print(name, out[name], flush=True)
    assert (
        len({v["pairs"] for v in out.values()}) == 1
    ), "all forms are exact — pair counts must match"
    print(json.dumps({"sf_dir": args.sf_dir, "reps": args.reps, **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
