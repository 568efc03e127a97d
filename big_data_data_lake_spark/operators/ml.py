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
