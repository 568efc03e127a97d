"""Distributed graph primitives shared by the dedup-clustering family.

``min_label_components`` is the Pregel-style connected-components
loop extracted from the near-dup clustering query (see
queries/corpus.py::dedup_clusters, where its scale rationale is
documented): one equi-join + one partial-aggregated min per round,
label sum as the exact convergence check, eager localCheckpoint to
cut the iterative lineage. Reference scope: the reference has no
graph operator; this is the §7 LLM-pipeline extension that turns
pairwise similarity into keep/drop decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    ids: DataFrame, pairs: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Connected components by min-label propagation.

    ``ids``: one column, the vertex id. ``pairs``: two columns, one
    undirected edge per row (any column names; symmetrized here).
    Returns (id, label) with label = min vertex id in the component;
    isolated vertices label themselves.

    Scale shape: per round, one equi-join of the edge list against the
    label frame and one min-aggregation — both partial-aggregated
    shuffles on the vertex id. Labels only ever decrease, so the exact
    decimal(38,0) label sum strictly decreases iff anything changed —
    a single-row convergence probe per round instead of a join+count.
    Neighbor-min plus pointer jumping converges in O(log diameter)
    rounds (see the loop comment); hard-fails rather than silently
    mislabeling if not converged in ``max_rounds``.

    Shuffle partitions for the loop are sized to GRAPH VOLUME, not the
    session default: every round launches ~5 shuffle stages on frames
    of |V|/|E| rows, and AQE's runtime coalescing does NOT cover the
    eager ``localCheckpoint`` materialization path — at the session's
    data-sized partition count a 20k-vertex graph paid 128-256 tasks
    per tiny stage (measured 2.3x the whole loop: 12.0 s -> 5.3 s at
    sf1). One partition per ~100k ids, floored at 8, capped at the
    session setting — a dup-graph at 100 TB keeps the full configured
    parallelism, a small one stops paying task-launch overhead. The
    session conf is restored in ``finally`` (engine queries execute
    serially; this is the same knob a per-stage scheduler would set).
    """
    id_col = ids.columns[0]
    a, b = pairs.columns[:2]
    sym = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    spark = ids.sparkSession
    n_ids = ids.count()
    n_edges = edges.count()  # also materializes the persist once, up front
    conf_key = "spark.sql.shuffle.partitions"
    old_p = spark.conf.get(conf_key)
    loop_p = max(8, min(int(old_p), -(-(n_ids + n_edges) // 100_000)))
    # Each round references `labels` TWICE (once in the propagation
    # join, once in the merge), so a persist()-chained loop doubles
    # the LOGICAL plan per round — by round ~8 the plan string hits
    # Spark's 2^31-char cap and analysis time explodes exponentially
    # (measured: round 5 = 2 s, round 8 = 107 s at a mere 2000
    # vertices). An EAGER localCheckpoint per round materializes AND
    # flattens the lineage, keeping every round's plan constant-size;
    # checkpoint blocks are reclaimed by the ContextCleaner as each
    # round's frame is dereferenced.
    #
    # The INITIAL checkpoint runs under the session partition setting:
    # the caller's `ids` plan may carry corpus-scale upstream shuffles
    # that must not execute at the loop's floor-8 clamp. Only after it
    # is materialized do we lower the conf — and the set happens inside
    # the try so the finally always restores the session even if the
    # first loop job fails.
    labels = ids.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    try:
        spark.conf.set(conf_key, str(loop_p))
        prev_sum = _label_sum(labels)
        for _ in range(max_rounds):
            prop = (
                edges.join(labels, edges.src == labels.vid)
                .groupBy("dst")
                .agg(F.min("label").alias("nlabel"))
            )
            merged = labels.join(prop, labels.vid == prop.dst, "left").select(
                labels.vid,
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias(
                    "label"
                ),
            )
            # Pointer jumping (path compression): l <- min(l, label(l)).
            # A label is always the id of a vertex in the same
            # component, so following it one hop preserves the
            # invariant while letting the min travel the distance the
            # LABEL has already traveled — neighbor-min alone moves one
            # hop per round (rounds = diameter), with the jump the
            # reach roughly doubles per round (rounds = O(log d)). On
            # a deep dup-chain at corpus scale that is the difference
            # between ~40 driver round-trips and ~7. One extra
            # self-join of the label frame per round buys it.
            x, y = merged.alias("x"), merged.alias("y")
            labels = (
                x.join(y, F.col("x.label") == F.col("y.vid"), "left")
                .select(
                    F.col("x.vid").alias("vid"),
                    F.least(
                        F.col("x.label"),
                        F.coalesce(F.col("y.label"), F.col("x.label")),
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            new_sum = _label_sum(labels)
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            raise RuntimeError(
                f"label propagation did not converge in {max_rounds} rounds"
            )
        return labels.select(F.col("vid").alias(id_col), "label")
    finally:
        spark.conf.set(conf_key, old_p)
        edges.unpersist()
