"""Spark-4 surface coverage: the Python DataSource API (the REST
feeder seam, SURVEY §2.1 S1), VariantType semi-structured extraction,
and observe() quality metrics in batch and streaming.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from big_data_data_lake_spark.observability import observe_batch, observe_stream
from big_data_data_lake_spark.sources.rest_source import RestStatesDataSource


def _register(spark):
    # idempotent per session; re-register is fine
    spark.dataSource.register(RestStatesDataSource)


def test_rest_datasource_pages_rows_and_schema(spark):
    _register(spark)
    df = (
        spark.read.format("rest_states")
        .option("pages", 3)
        .option("rows_per_page", 20)
        .load()
    )
    assert df.count() == 60
    assert df.select("page").distinct().count() == 3
    assert [f.name for f in df.schema.fields] == [
        "icao24", "callsign", "origin_country", "time_position",
        "longitude", "latitude", "velocity", "page",
    ]
    # each page is its own input partition -> page fetches parallelize
    assert df.rdd.getNumPartitions() == 3


def test_rest_datasource_is_deterministic(spark):
    _register(spark)
    read = lambda: sorted(
        spark.read.format("rest_states").option("pages", 2).load().collect()
    )
    assert read() == read()


def test_rest_datasource_composes_with_relational_plan(spark):
    _register(spark)
    df = spark.read.format("rest_states").option("pages", 2).load()
    out = (
        df.filter(F.col("velocity") > 150)
        .groupBy("origin_country")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = out.collect()
    assert rows and sum(r.n for r in rows) <= 100


def test_variant_get_typed_extraction(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "tag": "x"}',), ('{"k": "oops"}',), ("{}",)],
        "props string",
    )
    v = df.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
        F.try_variant_get(F.parse_json("props"), "$.tag", "string").alias("tag"),
    ).collect()
    assert [r.k for r in v] == [7, None, None]  # try_variant_get nulls mistypes
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with _pytest.raises(SparkRuntimeException):  # strict twin raises
        df.select(
            F.variant_get(F.parse_json("props"), "$.k", "int")
        ).collect()
    assert [r.tag for r in v] == ["x", None, None]


def test_observe_batch_counts_without_second_scan(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 5.0)], "id long, v double"
    )
    observed, obs = observe_batch(df, ["v"])
    assert observed.count() == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["v_nulls"] == 1
    assert got["v_min"] == 2.0 and got["v_max"] == 5.0


def test_observe_stream_metrics_per_microbatch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text('{"id": 1, "v": 2.0}\n{"id": 2, "v": null}\n')
    stream = (
        spark.readStream.schema("id long, v double")
        .json(str(src))
    )
    observed = observe_stream(stream, "quality", ["v"])
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_sink")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
        metrics = None
        for p in q.recentProgress:
            om = p.get("observedMetrics") if isinstance(p, dict) else p["observedMetrics"]
            if om and "quality" in om:
                metrics = om["quality"]
        assert metrics is not None, "no observedMetrics surfaced"
        assert metrics["n_rows"] == 2 and metrics["v_nulls"] == 1
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Python DataSource WRITER (jsonl_audit two-phase-commit sink)
# ---------------------------------------------------------------------------


def _register_sink(spark):
    from big_data_data_lake_spark.sources.jsonl_sink import JsonlAuditDataSource

    spark.dataSource.register(JsonlAuditDataSource)


def test_jsonl_audit_writer_commits_atomically(spark, tmp_path):
    """Each task writes one temp file; commit renames exactly the
    acknowledged files, writes a _SUCCESS manifest whose counts equal
    the data, and clears _temporary. A JSON round-trip through
    spark.read.json returns the rows."""
    import json as _json
    import os

    _register_sink(spark)
    out = str(tmp_path / "audit")
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id") % 7).alias("user")
    ).repartition(4)
    df.write.format("jsonl_audit").mode("append").save(out)

    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) == 4  # one committed file per task
    assert not os.path.isdir(os.path.join(out, "_temporary"))
    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 100
    assert sorted(manifest["files"]) == sorted(files)
    back = spark.read.json(out)
    assert back.count() == 100
    assert {r.user for r in back.select("user").distinct().collect()} == {
        f"u{i}" for i in range(7)
    }


def test_jsonl_audit_writer_overwrite_replaces_at_commit(spark, tmp_path):
    import json as _json
    import os

    _register_sink(spark)
    out = str(tmp_path / "audit_ow")
    spark.range(10).coalesce(1).write.format("jsonl_audit").mode("append").save(out)
    spark.range(5).coalesce(1).write.format("jsonl_audit").mode(
        "overwrite"
    ).save(out)
    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 5
    assert spark.read.json(out).count() == 5


def test_jsonl_audit_append_manifest_carries_prior_commits(spark, tmp_path):
    """A second append must MERGE the prior _SUCCESS file list, not
    replace it — manifest-gated readers would otherwise lose every
    earlier committed append (advisor finding, r5)."""
    import json as _json
    import os

    _register_sink(spark)
    out = str(tmp_path / "audit_appends")
    spark.range(10).coalesce(1).write.format("jsonl_audit").mode("append").save(out)
    spark.range(5).coalesce(1).write.format("jsonl_audit").mode("append").save(out)
    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert manifest["rows"] == 15
    assert sorted(manifest["files"]) == sorted(files)
    assert len(files) == 2
    assert spark.read.json(out).count() == 15


def test_jsonl_audit_overwrite_renames_before_removing(spark, tmp_path):
    """Overwrite order is rename-in -> _SUCCESS swap -> delete old:
    the manifest written at the atomicity point must never reference
    a file that was deleted first, and old files survive until after
    the swap (advisor finding, r5: delete-first meant a mid-commit
    crash left neither old nor new data visible)."""
    import json as _json
    import os

    _register_sink(spark)
    out = str(tmp_path / "audit_ow_order")
    spark.range(10).coalesce(1).write.format("jsonl_audit").mode("append").save(out)
    old_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    spark.range(5).coalesce(1).write.format("jsonl_audit").mode(
        "overwrite"
    ).save(out)
    manifest = _json.load(open(os.path.join(out, "_SUCCESS")))
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert on_disk == set(manifest["files"])  # superseded files swept
    assert not (old_files & on_disk)
    assert manifest["rows"] == 5


def test_jsonl_audit_writer_failed_job_commits_nothing(spark, tmp_path):
    """A task that fails after others succeeded must abort the whole
    job: no committed .jsonl files, no _SUCCESS — the commit is the
    atomicity point."""
    import os

    import pytest as _pytest
    from pyspark.sql import types as T

    _register_sink(spark)
    out = str(tmp_path / "audit_fail")

    @F.udf(T.LongType())
    def boom(v):
        if v == 7:
            raise ValueError("poisoned row")
        return v

    df = spark.range(10).repartition(4).select(boom(F.col("id")).alias("id"))
    with _pytest.raises(Exception):
        df.write.format("jsonl_audit").mode("append").save(out)
    committed = [
        f
        for f in os.listdir(out)
        if f.endswith(".jsonl") or f == "_SUCCESS"
    ] if os.path.isdir(out) else []
    assert committed == [], committed
