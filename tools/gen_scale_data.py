"""Scale-up data generator: synthesize sfN from sf0.1 by key-strided
replication, for superlinearity hunting (the per-round BENCH runs at
sf0.1; this answers "which query would not survive 10x the data").

Replication preserves the COMPOSITION the queries are sensitive to,
instead of naively duplicating rows:

- Fact/dim keys stride by rep * 1e9, preserving uniqueness and every
  FK relationship (orders->customer, lineitem->orders/part/supplier,
  events.user_id cohorts). nation/region stay fixed — real dimensions
  don't grow with fact volume.
- documents.text is Caesar-rotated per rep (letters only, whitespace
  untouched): each replica keeps the ORIGINAL's near-dup cluster
  structure internally, while cross-replica Jaccard collapses to ~0 —
  naive verbatim replication would turn every doc into a 10-member
  exact-dup cluster and inflate the inverted-index join ~100x for
  reasons that have nothing to do with plan scaling.
- embeddings cyclic-shift by rep positions: within-rep geometry is
  identical, cross-rep pairs decorrelate, so top-k/ANN output sizes
  scale like a real corpus rather than k identical copies.

Usage: python tools/gen_scale_data.py [factor] [out_dir]
       (defaults: 10, .bench/sf1 — gitignored)

Composition caveat at factor > 26: the Caesar rotation wraps mod 26,
so reps 0/26/52/78 carry VERBATIM document copies — the sf10 corpus
deliberately has a ~4x exact-duplication rate, which inflates true
near-dup pair COUNTS combinatorially (measured in SCALE.md's 100x
sweep: pair outputs grow ~3,000x while pair-query time grows 18-67x —
i.e. the plans are output-bound). Embeddings similarly re-coincide
every 64 reps (cyclic shift mod dim). Fine for plan-scaling studies —
just normalize per OUTPUT row for the pair queries.
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_data_lake_spark.session import get_spark

STRIDE = 1_000_000_000

# (table, columns to stride by rep*STRIDE)
KEYED = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["nation", "region"]

_LOWER = string.ascii_lowercase
_UPPER = string.ascii_uppercase


def _rot_expr(col: str, rep: int):
    """Caesar-rotate letters by rep (identity at rep 0)."""
    k = rep % 26
    if k == 0:
        return F.col(col)
    return F.translate(
        F.col(col),
        _LOWER + _UPPER,
        _LOWER[k:] + _LOWER[:k] + _UPPER[k:] + _UPPER[:k],
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".bench/sf1"
    src = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="gen-scale")

    for t in COPIED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        reps = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
        )
        for k in keys:
            reps = reps.withColumn(
                k, (F.col(k) + F.col("__rep").cast("long") * STRIDE).cast("long")
            )
        if t == "documents":
            # per-rep cipher: within-rep dup structure preserved,
            # cross-rep similarity destroyed
            rot = F.col("text")
            for r in range(1, factor):
                rot = F.when(F.col("__rep") == r, _rot_expr("text", r)).otherwise(rot)
            reps = reps.withColumn("text", rot)
        if t == "embeddings":
            n = F.size("embedding")
            shift = F.col("__rep") % n
            reps = reps.withColumn(
                "embedding",
                F.when(shift == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice("embedding", shift + 1, n - shift),
                        F.slice("embedding", 1, shift),
                    )
                ),
            )
        reps.drop("__rep").repartition(8).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: x{factor} -> {out}")


if __name__ == "__main__":
    main()
