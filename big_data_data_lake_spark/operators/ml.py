"""ML / advanced analytics operators (SURVEY §2.8, M1-M6).

M1-M3 re-express the reference's scikit-learn pipeline
(services/analytics/app.py:57-95) on pyspark.ml: VectorAssembler →
StandardScaler → KMeans, then semantic labeling of clusters by their
mean vertical-rate-like feature. Distributed: Spark ML KMeans is a
parallel Lloyd's over the partitioned feature vectors — no driver-side
collect at any size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_cluster(
    df: DataFrame,
    features: Sequence[str],
    k: int = 3,
    seed: int = 42,
    min_rows: int = 50,
    out: str = "cluster",
) -> DataFrame:
    """M1+M2 — standardize features, KMeans(k, seed), predict per row
    (app.py:57-70). Below ``min_rows`` rows every row gets cluster -1,
    matching the reference's "<50 rows → Unknown" guard."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    clean = df.na.drop(subset=list(features))
    if clean.limit(min_rows).count() < min_rows:
        return df.withColumn(out, F.lit(-1))

    assembler = VectorAssembler(inputCols=list(features), outputCol="__fv")
    scaler = StandardScaler(inputCol="__fv", outputCol="__fvs", withMean=True, withStd=True)
    km = KMeans(k=k, seed=seed, featuresCol="__fvs", predictionCol=out)

    assembled = assembler.transform(clean)
    scaled = scaler.fit(assembled).transform(assembled)
    model = km.fit(scaled)
    return model.transform(scaled).drop("__fv", "__fvs")


def lloyd_kmeans_deterministic(
    df: DataFrame,
    features: Sequence[str],
    seed_band: "F.Column",
    iters: int = 3,
    digits: int = 6,
    out: str = "cluster",
) -> DataFrame:
    """Fully deterministic unrolled Lloyd's KMeans — the oracle-checkable
    twin of ``kmeans_cluster`` (MLlib's trainer is seed-stable within a
    Spark version but its init sampling and float reduction order are
    not replayable in an ANSI engine, hence kmeans_phases' rows-only
    check).

    Determinism recipe — every arithmetic step is quantized so a SQL
    engine replays it bit-for-bit:
    - standardization uses ``round(avg, digits)`` / ``round(stddev_samp,
      digits)`` computed IN-ENGINE (engine rounding, not Python's
      bankers-rounding), then ``round((x-m)/s, digits)``;
    - initial centroids are per-``seed_band`` means of the standardized
      features (the band expression is part of the contract);
    - each iteration assigns rows to the argmin-distance centroid
      (ties -> lowest cluster id, matching ``ORDER BY dist, cid``) and
      recomputes rounded centroid means; an emptied cluster keeps its
      previous centroid (= SQL ``coalesce`` on a left join);
    - after ``iters`` assignment passes the LAST assignment is returned
      (no extra E-step).

    Scale shape: identical to MLlib's own loop — per-iteration work is
    one map-side-combinable k-key aggregation over the (persisted)
    standardized frame plus a k-row collect (metadata-scale, same
    pattern as the IVF coarse quantizer); assignment is row-local
    against broadcast literal centroids. No O(n) driver data ever."""
    from ..caching import scoped_persist

    feats = list(features)
    nf = len(feats)
    st = df.agg(
        *[
            a
            for i, f in enumerate(feats)
            for a in (
                F.round(F.avg(f), digits).alias(f"m{i}"),
                F.round(F.stddev_samp(f), digits).alias(f"s{i}"),
            )
        ]
    ).first()
    z = scoped_persist(
        df.select(
            "*",
            *[
                F.round((F.col(f) - F.lit(st[f"m{i}"])) / F.lit(st[f"s{i}"]), digits).alias(
                    f"z{i}"
                )
                for i, f in enumerate(feats)
            ],
        )
    )
    zcols = [f"z{i}" for i in range(nf)]
    cent_aggs = [F.round(F.avg(c), digits).alias(f"m{i}") for i, c in enumerate(zcols)]

    def collect_cents(grouped: DataFrame) -> dict[int, tuple[float, ...]]:
        return {
            int(r["cid"]): tuple(float(r[f"m{i}"]) for i in range(nf))
            for r in grouped.collect()
        }

    cents = collect_cents(z.groupBy(seed_band.cast("int").alias("cid")).agg(*cent_aggs))
    if not cents:
        # empty input: no seed groups, nothing to iterate — keep the
        # schema contract (zero rows) instead of indexing into an
        # empty centroid list
        return z.withColumn(out, F.lit(None).cast("int"))

    def assign(cents_d: dict[int, tuple[float, ...]]) -> "F.Column":
        items = sorted(cents_d.items())
        dists = []
        for cid, vec in items:
            d = None
            for c, m in zip(zcols, vec):
                term = (F.col(c) - F.lit(m)) * (F.col(c) - F.lit(m))
                d = term if d is None else d + term
            dists.append((cid, d))
        # first cid whose distance <= every LATER distance == the
        # lowest-cid argmin (proof: conditions fail for every index
        # before the first global minimum)
        chain = None
        for idx, (cid, d) in enumerate(dists[:-1]):
            cond = None
            for _, od in dists[idx + 1 :]:
                leq = d <= od
                cond = leq if cond is None else cond & leq
            chain = F.when(cond, F.lit(cid)) if chain is None else chain.when(cond, F.lit(cid))
        last = F.lit(dists[-1][0])
        return chain.otherwise(last) if chain is not None else last

    for _ in range(iters - 1):
        new = collect_cents(z.groupBy(assign(cents).alias("cid")).agg(*cent_aggs))
        cents = {cid: new.get(cid, vec) for cid, vec in cents.items()}
    return z.withColumn(out, assign(cents))


def label_clusters_by_mean(
    clustered: DataFrame,
    cluster_col: str,
    measure: str,
    hi_label: str = "Takeoff/Climb",
    lo_label: str = "Descent/Approach",
    mid_label: str = "Cruise",
    threshold: float = 1.0,
    out: str = "phase",
) -> DataFrame:
    """M3 — semantic cluster labeling (app.py:77-95): per-cluster mean
    of ``measure``; >+t → hi, <-t → lo, else mid. A4 group-means plus
    a broadcast label join back."""
    means = (
        clustered.groupBy(cluster_col)
        .agg(F.avg(measure).alias("__m"))
        .withColumn(
            out,
            F.when(F.col("__m") > threshold, hi_label)
            .when(F.col("__m") < -threshold, lo_label)
            .otherwise(mid_label),
        )
        .drop("__m")
    )
    return clustered.join(F.broadcast(means), on=cluster_col, how="left")
