"""Lake-table metadata layer: snapshot isolation, time travel,
partition pruning from the manifest, and atomic commits.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_data_lake_spark.sources.metadata import LakeTable


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, "2024-01-01"), (2, "b", 20.0, "2024-01-01"),
         (3, "a", 30.0, "2024-01-02")],
        "id long, k string, v double, day string",
    )


def test_create_read_roundtrip(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    assert t.create(events, partition_by=["day"]) == 0
    got = t.read()
    assert got.schema == events.schema
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]


def test_append_creates_new_version_old_still_readable(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    more = spark.createDataFrame(
        [(4, "c", 40.0, "2024-01-03")], "id long, k string, v double, day string"
    )
    assert t.append(more) == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3, 4]
    # time travel: version 0 unchanged
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2, 3]


def test_overwrite_is_snapshot_isolated(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    t.overwrite(
        spark.createDataFrame([(9, "z", 0.0, "2024-02-01")], events.schema)
    )
    assert [r.id for r in t.read().collect()] == [9]
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2, 3]


def test_table_rooted_under_equals_dir_reads_clean(spark, events, tmp_path):
    """A table whose ROOT path contains '=' (e.g. /data/run=3/tbl)
    must not have that segment mistaken for a hive partition
    boundary: basePath anchored there would truncate the root and
    inject a spurious inferred 'run' column on every read (advisor
    finding, r5 — _base_of scanned the whole path for '=')."""
    root = tmp_path / "run=3" / "tbl"
    t = LakeTable(spark, str(root))
    t.create(events, partition_by=["day"])
    got = t.read()
    assert got.schema == events.schema  # no spurious 'run' column
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
    # unpartitioned table under the same root: same guarantee
    u = LakeTable(spark, str(tmp_path / "run=3" / "flat"))
    u.create(events.drop("day"))
    got2 = u.read()
    assert got2.schema == events.drop("day").schema
    assert got2.count() == 3


def test_partition_filter_prunes_files_manifest_side(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    pruned = t.read(partition_filter={"day": "2024-01-01"})
    rows = pruned.collect()
    assert sorted(r.id for r in rows) == [1, 2]
    # the pruned read must touch only matching files
    man = t.manifest()
    matching = [f for f in man["files"] if f["partition"].get("day") == "2024-01-01"]
    assert {os.path.dirname(f["path"]) for f in matching}


def test_row_count_answers_from_manifest_only(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events)
    assert t.row_count() == 3


def test_double_create_refuses(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events)
    with pytest.raises(FileExistsError):
        t.create(events)


def test_stat_filter_skips_files_by_zone_map(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    lo = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    hi = spark.createDataFrame([(i, float(i)) for i in range(100, 110)], "id long, v double")
    t.create(lo.coalesce(1))
    t.append(hi.coalesce(1))
    man = t.manifest()
    assert all("stats" in f and "v" in f["stats"] for f in man["files"])
    # predicate v >= 100: only the hi file can match
    pruned = t.read(stat_filter={"v": (100.0, None)})
    assert sorted(r.id for r in pruned.collect()) == list(range(100, 110))
    # files actually handed to Spark: 1 of 2
    matching = [
        f for f in man["files"]
        if not (f["stats"]["v"]["max"] < 100.0)
    ]
    assert len(matching) == 1 and len(man["files"]) == 2


def test_compact_merges_small_files(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(i, "2024-01-0" + str(1 + i % 2)) for i in range(20)], "id long, day string"
    )
    t.create(base.repartition(4), partition_by=["day"])
    for _ in range(3):
        t.append(base.limit(5).repartition(2))
    n_before = len(t.manifest()["files"])
    v = t.compact(files_per_partition=1)
    n_after = len(t.manifest(v)["files"])
    assert n_after < n_before
    assert n_after == 2  # one file per day partition
    assert t.read().count() == 35


def test_vacuum_drops_old_versions_and_dead_files(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "x")], "id long, k string")
    t.create(df)
    t.overwrite(spark.createDataFrame([(2, "y")], "id long, k string"))
    deleted = t.vacuum(retain_last=1)
    assert deleted, "vacuum should delete the dead v0 file"
    assert t.versions() == [t.latest_version()]
    assert [r.id for r in t.read().collect()] == [2]


def test_shallow_clone_is_zero_copy_and_independently_writable(spark, tmp_path):
    """SHALLOW CLONE: the clone's v0 references the source's files by
    absolute path (no data copied), reads equal the source snapshot,
    appends to the clone land under the clone's own directory and
    union correctly across the mixed roots (per-file basePath), the
    source never changes, and the clone's vacuum cannot touch source
    files."""
    import os

    src = LakeTable(spark, str(tmp_path / "src"))
    base = spark.createDataFrame(
        [(i, "d" + str(i % 2)) for i in range(10)], "id long, day string"
    )
    src.create(base.repartition(2), partition_by=["day"])

    clone = src.clone_to(str(tmp_path / "clone"))
    # zero-copy: no parquet under the clone dir, yet full content reads
    assert not clone._list_parquet()
    assert sorted(r.id for r in clone.read().collect()) == list(range(10))
    assert clone.manifest()["cloned_from"]["path"] == src.path
    assert clone.history()[0]["operation"] == "clone"

    # clone is independently writable; source snapshot is unaffected
    clone.append(
        spark.createDataFrame([(100, "d0")], "id long, day string")
    )
    assert sorted(r.id for r in clone.read().collect()) == list(range(10)) + [100]
    assert src.read().count() == 10
    # partition pruning still works across mixed roots
    d0 = clone.read(partition_filter={"day": "d0"})
    assert set(r.id for r in d0.collect()) == {0, 2, 4, 6, 8, 100}

    # clone vacuum retires only clone-rooted files
    clone.overwrite(spark.createDataFrame([(7, "d1")], "id long, day string"))
    deleted = clone.vacuum(retain_last=1)
    assert all(p.startswith(clone.path) for p in deleted)
    assert src.read().count() == 10  # source files all intact


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    """RESTORE semantics: content returns to the target version via a
    NEW metadata-only commit (no data movement, history preserved),
    the streaming batch_id high-water mark does NOT roll back, and a
    later vacuum keeps the restored files alive because the retained
    manifest references them."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "good")], "id long, k string"))
    t.overwrite(
        spark.createDataFrame([(2, "bad-backfill")], "id long, k string")
    )
    # streaming guard state on the LATEST version
    t.append(spark.createDataFrame([(3, "z")], "id long, k string"), extra={"batch_id": 7})
    v = t.restore(0)
    assert v == 3
    assert [r.k for r in t.read().collect()] == ["good"]
    assert t.manifest()["batch_id"] == 7  # high-water mark survives
    assert t.manifest()["restored_from"] == 0
    assert [e["operation"] for e in t.history()] == [
        "create", "overwrite", "append", "restore",
    ]
    # the restore commit references v0's file BY REFERENCE
    assert {f["path"] for f in t.manifest(3)["files"]} == {
        f["path"] for f in t.manifest(0)["files"]
    }
    # vacuum to just the restore commit: v0's file must SURVIVE
    # (referenced by the retained manifest); the bad-backfill file dies
    deleted = t.vacuum(retain_last=1)
    assert deleted, "vacuum should delete the unreferenced files"
    assert [r.k for r in t.read().collect()] == ["good"]


def test_upsert_rewrites_only_matching_files(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    lo = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, val string")
    hi = spark.createDataFrame([(i, f"v{i}") for i in range(100, 110)], "id long, val string")
    t.create(lo.coalesce(1))
    t.append(hi.coalesce(1))
    before = t.manifest()
    lo_file = next(f["path"] for f in before["files"] if f["stats"]["id"]["max"] < 100)

    up = spark.createDataFrame([(105, "NEW"), (200, "APPENDED")], "id long, val string")
    v = t.upsert(up, keys=["id"])
    after = t.manifest(v)

    # the low-range file was untouched: same path carried by reference
    assert lo_file in {f["path"] for f in after["files"]}
    got = {r.id: r.val for r in t.read().collect()}
    assert got[105] == "NEW" and got[200] == "APPENDED" and got[5] == "v5"
    assert len(got) == 21  # 10 + 10 + 1 appended, 105 replaced not duplicated
    # time travel still sees the pre-merge value
    old = {r.id: r.val for r in t.read(version=v - 1).collect()}
    assert old[105] == "v105" and 200 not in old


def test_upsert_null_keys_replace_not_duplicate(spark, tmp_path):
    """A NULL key must REPLACE the stored NULL-key row, not append a
    duplicate: the anti-join is null-safe (<=>) and zone-map pruning
    is disabled when the incoming batch carries a NULL key (footer
    min/max excludes nulls, so no file can be proven null-free)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(1, "a"), (None, "old_null")], "id long, val string"
        ).coalesce(1)
    )
    t.upsert(
        spark.createDataFrame([(None, "new_null"), (2, "b")], "id long, val string"),
        keys=["id"],
    )
    got = sorted(
        ((r.id, r.val) for r in t.read().collect()),
        key=lambda p: (p[0] is None, p[0] or 0),
    )
    assert got == [(1, "a"), (2, "b"), (None, "new_null")]


def test_append_with_schema_evolution(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id long, k string"))
    # incompatible append rejected without the flag
    widened = spark.createDataFrame([(2, "b", 9.5)], "id long, k string, score double")
    with pytest.raises(ValueError):
        t.append(widened)
    t.append(widened, merge_schema=True)
    got = {r.id: (r.k, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    # dropping a column on a later append back-fills nulls
    t.append(spark.createDataFrame([(3, 7.0)], "id long, score double"), merge_schema=True)
    got = {r.id: (r.k, r.score) for r in t.read().collect()}
    assert got[3] == (None, 7.0)
    # type change is refused
    with pytest.raises(ValueError):
        t.append(
            spark.createDataFrame([(4, 1, 2.0)], "id long, k int, score double"),
            merge_schema=True,
        )


def test_commit_is_put_if_absent(spark, tmp_path):
    """Two writers racing on the same version: exactly one wins, and
    the loser's error does not clobber the winner's manifest (the
    exists()-then-replace formulation was TOCTOU — both writers pass
    the check and the second silently overwrites the first)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id long, k string"))
    man_v1 = dict(t.manifest(), marker="winner")
    t._commit(1, man_v1, "overwrite")
    with pytest.raises(FileExistsError):
        t._commit(1, dict(man_v1, marker="loser"), "overwrite")
    assert t.manifest(1)["marker"] == "winner"
    # tmp files are cleaned up on both paths
    import os
    assert not [f for f in os.listdir(t._mdir) if f.endswith(".tmp")]


def test_batch_id_survives_maintenance_commits(spark, tmp_path):
    """The streaming replay guard reads batch_id from the LATEST
    manifest; compact/overwrite/upsert between micro-batches must
    carry it forward or a replayed batch would be appended twice."""
    t = LakeTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(4)], "id long, val string")
    t.create(df, extra={"batch_id": 0})
    t.append(spark.createDataFrame([(10, "x")], "id long, val string"),
             extra={"batch_id": 1})
    t.compact()
    assert t.manifest()["batch_id"] == 1
    t.overwrite(df)
    assert t.manifest()["batch_id"] == 1
    t.upsert(spark.createDataFrame([(2, "NEW")], "id long, val string"), keys=["id"])
    assert t.manifest()["batch_id"] == 1
    # a real micro-batch still advances it
    t.append(spark.createDataFrame([(11, "y")], "id long, val string"),
             extra={"batch_id": 2})
    assert t.manifest()["batch_id"] == 2


def test_upsert_after_schema_evolution(spark, tmp_path):
    """Upserting a table whose touched files pre-date an added column
    must read them through the evolved-schema path (null-fill), not
    fail on a missing-column select."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string").coalesce(1))
    t.append(
        spark.createDataFrame([(3, "c", 9.5)], "id long, k string, score double"),
        merge_schema=True,
    )
    # touches the v0 file (id range overlaps), which lacks `score`
    v = t.upsert(
        spark.createDataFrame([(2, "B", 1.5)], "id long, k string, score double"),
        keys=["id"],
    )
    got = {r.id: (r.k, r.score) for r in t.read(version=v).collect()}
    assert got == {1: ("a", None), 2: ("B", 1.5), 3: ("c", 9.5)}
    # an upsert with a NARROWER frame null-fills and never narrows the
    # table schema
    t.upsert(spark.createDataFrame([(4,)], "id long"), keys=["id"])
    got = {r.id: (r.k, r.score) for r in t.read().collect()}
    assert got[4] == (None, None) and got[3] == ("c", 9.5)


def test_changes_returns_only_new_rows(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id long, k string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, k string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, k string"))
    assert sorted(r.id for r in t.changes(0).collect()) == [2, 3]
    assert [r.id for r in t.changes(0, 1).collect()] == [2]
    assert [r.id for r in t.changes(1, 2).collect()] == [3]
    assert t.changes(2, 2).count() == 0


def test_cluster_by_zorder_enables_multi_column_skipping(spark, tmp_path):
    """After z-ordering on (x, y), a stat_filter on EITHER column must
    prune most files; a plain x-sorted layout only helps x."""
    import pyspark.sql.functions as F

    n, files = 40_000, 16
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    )
    plain = LakeTable(spark, str(tmp_path / "plain"))
    plain.create(df.repartitionByRange(files, "x"))
    zed = LakeTable(spark, str(tmp_path / "zed"))
    zed.create(df)
    zed.cluster_by(["x", "y"], n_files=files)

    def files_scanned(t, col):
        man = t.manifest()
        lo, hi = 10, 20  # a 5% slice of the domain
        keep = [
            f for f in man["files"]
            if not (f["stats"][col]["min"] > hi or f["stats"][col]["max"] < lo)
        ]
        return len(keep), len(man["files"])

    zx, zn = files_scanned(zed, "x")
    zy, _ = files_scanned(zed, "y")
    px, pn = files_scanned(plain, "x")
    py_, _ = files_scanned(plain, "y")
    assert zx <= zn // 2 and zy <= zn // 2   # z-order prunes BOTH dims
    assert px <= pn // 2                      # sort prunes its own column
    assert zy < py_                           # ...and is strictly worse than
                                              # z-order on the non-leading one
    # layout changed, data did not
    got = sorted((r.id, r.x, r.y) for r in zed.read().collect())
    want = sorted((r.id, r.x, r.y) for r in df.collect())
    assert got == want
    # and the pruned read returns exactly the matching rows
    pruned = zed.read(stat_filter={"y": (10, 20)}).where(F.col("y").between(10, 20))
    assert pruned.count() == df.where(F.col("y").between(10, 20)).count()


def test_expectations_fail_mode_rejects_commit(spark, tmp_path):
    """A violating batch under mode='fail' raises and commits NOTHING
    — the table's version history is unchanged."""
    from big_data_data_lake_spark.sources.metadata import (
        ExpectationViolation,
        LakeTable,
    )

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10.0)], "id long, v double"))
    bad = spark.createDataFrame([(2, -5.0), (3, 7.0)], "id long, v double")
    import pytest as _pytest

    with _pytest.raises(ExpectationViolation) as ei:
        t.append(bad, expectations={"v_nonneg": "v >= 0", "id_set": "id IS NOT NULL"})
    assert ei.value.violations == {"v_nonneg": 1}
    assert t.latest_version() == 0 and t.row_count() == 1


def test_expectations_drop_mode_filters_and_audits(spark, tmp_path):
    """mode='drop' admits passing rows only and records per-rule
    violation counts in the committed manifest. NULL rule results
    satisfy the rule (SQL CHECK semantics) — null rows are kept."""
    from big_data_data_lake_spark.sources.metadata import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10.0)], "id long, v double"))
    batch = spark.createDataFrame(
        [(2, -5.0), (3, 7.0), (4, None)], "id long, v double"
    )
    v = t.append(batch, expectations={"v_nonneg": "v >= 0"}, expect_mode="drop")
    man = t.manifest(v)
    assert man["expectations"] == {
        "mode": "drop",
        "violations": {"v_nonneg": 1},
    }
    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 3, 4]  # -5 dropped; NULL kept


def test_bloom_filter_point_lookup_skips_files(spark, tmp_path):
    """Bloom skipping prunes files for point lookups that zone maps
    cannot (hash-scattered keys: every file's min/max covers every
    query); results stay exact, and files appended after add_bloom
    are never skipped."""
    from big_data_data_lake_spark.sources.metadata import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, str(i % 7)) for i in range(400)], "id long, tag string"
    )
    # hash-scatter ids across 4 files so min/max ranges all overlap
    t.create(df.repartition(4, "id"))
    v = t.add_bloom("id")
    assert t.latest_version() == v

    hit = t.read(bloom_eq={"id": 123})
    assert len(hit.inputFiles()) < 4  # pruned
    assert [r.id for r in hit.where("id = 123").collect()] == [123]

    # absent key: bloom may prune everything (no false negatives ever)
    miss = t.read(bloom_eq={"id": 99999})
    assert miss.where("id = 99999").count() == 0

    # string column bloom
    t.add_bloom("tag")
    tagged = t.read(bloom_eq={"tag": "3"})
    assert tagged.where("tag = '3'").count() == len([i for i in range(400) if i % 7 == 3])

    # appended files have no bloom -> included, never wrongly skipped
    t.append(spark.createDataFrame([(1000, "x")], "id long, tag string"))
    assert t.read(bloom_eq={"id": 1000}).where("id = 1000").count() == 1


def test_norm_file_uri_matches_across_schemes():
    """ADVICE r2: bloom path matching must survive URI schemes and
    percent-encoding, or bitmaps silently attach to zero files."""
    from big_data_data_lake_spark.sources.metadata import _norm_file_uri

    assert _norm_file_uri("file:///tmp/a%20b/x.parquet") == "/tmp/a b/x.parquet"
    assert _norm_file_uri("/tmp/a b/x.parquet") == "/tmp/a b/x.parquet"
    assert (
        _norm_file_uri("hdfs://nn:8020/warehouse/t/part-0.parquet")
        == "hdfs://nn:8020/warehouse/t/part-0.parquet"
    )
    assert (
        _norm_file_uri("s3a://bucket/k%C3%A9y/p.parquet")
        == "s3a://bucket/kéy/p.parquet"
    )


def test_laketable_satisfies_tableformat_protocol(spark, tmp_path):
    """The parquet-backed LakeTable must structurally satisfy the
    TableFormat protocol — the seam a Delta/Iceberg adapter slots
    into where the jar exists (sources/format.py documents the
    coordinates and method mapping)."""
    from big_data_data_lake_spark.sources.format import TableFormat, delta_available

    t = LakeTable(spark, str(tmp_path / "t"))
    assert isinstance(t, TableFormat)
    # every protocol member is a real method here, not a getattr hole
    for m in (
        "versions",
        "latest_version",
        "create",
        "append",
        "overwrite",
        "upsert",
        "read",
        "changes",
        "row_count",
        "compact",
        "vacuum",
    ):
        assert callable(getattr(t, m)), m
    # the gate must report actual importability, nothing aspirational
    try:
        import delta  # noqa: F401

        expect = True
    except ImportError:
        expect = False
    assert delta_available() is expect


def test_delta_adapter_satisfies_tableformat_protocol(spark, tmp_path):
    """The Delta binding is CODE (sources/format.py::DeltaTableAdapter),
    and its construction is delta-import-free, so the structural
    protocol check runs even in this jar-less container — the
    execution parity sweep below is what gates on the jar."""
    from big_data_data_lake_spark.sources.format import (
        DeltaTableAdapter,
        TableFormat,
    )

    a = DeltaTableAdapter(spark, str(tmp_path / "d"))
    assert isinstance(a, TableFormat)


@pytest.mark.skipif(
    not __import__(
        "big_data_data_lake_spark.sources.format", fromlist=["delta_available"]
    ).delta_available(),
    reason="delta-spark jar not present (CLUSTER.md documents the blocker: "
    "no network, no artifact on disk; binding verified wherever "
    "io.delta:delta-spark_2.13 is available)",
)
def test_delta_adapter_parity_with_laketable_semantics(tmp_path):
    """Where the delta-spark jar exists: the adapter must deliver the
    same create/append/time-travel/upsert/changes semantics LakeTable
    attests over parquet manifests. Runs in its OWN session (Delta
    needs its SQL extension at session build; the shared fixture
    session cannot be retrofitted)."""
    from pyspark.sql import SparkSession

    from big_data_data_lake_spark.sources.format import (
        DeltaTableAdapter,
        delta_session_builder,
    )

    spark = (
        delta_session_builder(
            SparkSession.builder.master("local[2]")
            .appName("delta-parity")
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.enabled", "false")
            # NOTE: deliberately NOT disabling retentionDurationCheck
            # here — vacuum() scopes that itself (r6 advisory: the
            # test session's global override was masking a production
            # IllegalArgumentException on any table younger than 168h)
        )
        .getOrCreate()
    )
    try:
        t = DeltaTableAdapter(spark, str(tmp_path / "dt"))
        df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
        v0 = t.create(df0)
        v1 = t.append(spark.createDataFrame([(3, "c")], "id long, k string"))
        assert v1 > v0 and t.row_count() == 3
        assert t.row_count(version=v0) == 2  # time travel
        t.upsert(
            spark.createDataFrame([(2, "B"), (4, "d")], "id long, k string"),
            keys=["id"],
        )
        got = {(r.id, r.k) for r in t.read().collect()}
        assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
        ch = t.changes(v_from=v1 + 1)
        assert {r._change_type for r in ch.collect()} >= {"insert"}
        assert t.versions() == sorted(t.versions())
    finally:
        spark.stop()


def test_scd2_upsert_keeps_history_and_point_in_time_reads(spark, tmp_path):
    """Type-2 merge: the matched current row closes instead of being
    replaced; read_asof() reconstructs any point in time; history
    survives even after further merges."""
    t = LakeTable(spark, str(tmp_path / "dim"))
    t.create(
        spark.createDataFrame(
            [(1, "alice", "bronze"), (2, "bob", "silver")],
            "id long, name string, tier string",
        ).coalesce(1)
    )
    # day 1: alice upgrades
    t.upsert_scd2(
        spark.createDataFrame(
            [(1, "alice", "gold", "2024-02-01 00:00:00")],
            "id long, name string, tier string, changed string",
        ).withColumn("changed", F.col("changed").cast("timestamp")),
        keys=["id"],
        change_ts="changed",
    )
    # day 2: alice changes again, carol appears
    t.upsert_scd2(
        spark.createDataFrame(
            [
                (1, "alice", "platinum", "2024-03-01 00:00:00"),
                (3, "carol", "bronze", "2024-03-01 00:00:00"),
            ],
            "id long, name string, tier string, changed string",
        ).withColumn("changed", F.col("changed").cast("timestamp")),
        keys=["id"],
        change_ts="changed",
    )

    # current state: one open row per live key
    cur = {
        r.id: r.tier
        for r in t.read().where(F.col("__is_current")).collect()
    }
    assert cur == {1: "platinum", 2: "silver", 3: "bronze"}
    # alice has 3 versions in the data, none destroyed
    assert t.read().where("id = 1").count() == 3

    # point-in-time: mid-February sees the gold row; January the bootstrap
    feb = {r.id: r.tier for r in t.read_asof("2024-02-15 00:00:00").collect()}
    assert feb == {1: "gold", 2: "silver"}
    jan = {r.id: r.tier for r in t.read_asof("2024-01-15 00:00:00").collect()}
    assert jan == {1: "bronze", 2: "silver"}


def test_scd2_prunes_unmatched_files_after_bootstrap(spark, tmp_path):
    """After the bootstrap commit, a delta touching only the high key
    range must carry the low-range file over by reference."""
    t = LakeTable(spark, str(tmp_path / "dim"))
    lo = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, val string")
    hi = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100, 110)], "id long, val string"
    )
    t.create(lo.coalesce(1))
    t.append(hi.coalesce(1))
    # bootstrap: everything rewrites (gains the SCD2 columns)
    t.upsert_scd2(
        spark.createDataFrame(
            [(105, "NEW", "2024-02-01 00:00:00")], "id long, val string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        keys=["id"],
        change_ts="ts",
    )
    before = t.manifest()
    lo_files = {
        f["path"] for f in before["files"] if f["stats"]["id"]["max"] < 100
    }
    assert lo_files
    # post-bootstrap delta in the high range only
    v = t.upsert_scd2(
        spark.createDataFrame(
            [(107, "NEWER", "2024-03-01 00:00:00")], "id long, val string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        keys=["id"],
        change_ts="ts",
    )
    after = {f["path"] for f in t.manifest(v)["files"]}
    assert lo_files <= after, "low-range files must carry over by reference"
    assert t.read().where("id = 107 AND __is_current").count() == 1
    assert t.read().where("id = 107").count() == 2


def test_delete_where_removes_rows_new_version(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    v = t.delete_where("id = 2")
    assert v == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 3]
    # time travel: the deleted row is still visible at version 0
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2, 3]


def test_delete_where_rewrites_only_matching_files(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    before = {f["path"] for f in t.manifest()["files"]}
    # only day=2024-01-02 holds id=3; the 01-01 file must carry over
    t.delete_where("id = 3")
    after = t.manifest()["files"]
    carried = [f for f in after if f["path"] in before]
    assert carried and all(
        f["partition"].get("day") == "2024-01-01" for f in carried
    )
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_delete_where_null_predicate_keeps_row(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, "x")], "id long, k string"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(df)
    # SQL DELETE semantics: NULL predicate result keeps the row
    t.delete_where("k = 'x'")
    assert sorted(r.id for r in t.read().collect()) == [1]


def test_delete_where_no_match_is_noop(spark, events, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    assert t.delete_where("id = 999") == 0  # no new version
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_delete_matching_join_frame(spark, events, tmp_path):
    """r7 verdict item #3: the join-frame DELETE — removes exactly the
    rows whose key appears in the frame, rewrites only the files that
    contain a match, time travel still sees the rows, and an
    unmatched frame is a no-op (no new version)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(events, partition_by=["day"])
    before = {f["path"] for f in t.manifest()["files"]}
    ids = spark.createDataFrame([(3,), (999,)], "id long")
    v = t.delete_matching(ids, keys=["id"])
    assert v == 1
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    assert sorted(r.id for r in t.read(version=0).collect()) == [1, 2, 3]
    # only day=2024-01-02 holds id=3; the 01-01 file carries over
    carried = [f for f in t.manifest()["files"] if f["path"] in before]
    assert carried and all(
        f["partition"].get("day") == "2024-01-01" for f in carried
    )
    # no-op: nothing matches -> no new version
    none = spark.createDataFrame([(999,)], "id long")
    assert t.delete_matching(none, keys=["id"]) == 1
    assert t.manifest()["operation"] == "delete_matching"


def test_delete_matching_null_keys_match_nullsafe(spark, tmp_path):
    """Join-frame semantics: a NULL key in the frame deletes stored
    NULL-key rows (<=>), unlike SQL DELETE's NULL-keeps-the-row."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, k string")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(df)
    frame = spark.createDataFrame([(None,)], "k string")
    t.delete_matching(frame, keys=["k"])
    assert sorted(r.id for r in t.read().collect()) == [2]


def test_read_binary_files_source(spark, tmp_path):
    from big_data_data_lake_spark.sources.catalog import read_binary_files

    (tmp_path / "a.ppm").write_bytes(b"P6 1 1 255\n\x01\x02\x03")
    (tmp_path / "b.ppm").write_bytes(b"P6 2 1 255\n" + b"\x00" * 6)
    (tmp_path / "c.txt").write_bytes(b"not an image")
    df = read_binary_files(spark, str(tmp_path), glob="*.ppm")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.ppm", "b.ppm"}
    assert bytes(rows["a.ppm"].content) == b"P6 1 1 255\n\x01\x02\x03"
    assert rows["b.ppm"].length == 17
    capped = read_binary_files(spark, str(tmp_path), glob="*.ppm", max_bytes=14)
    assert [os.path.basename(r.path) for r in capped.collect()] == ["a.ppm"]


def test_history_records_operations(spark, events, tmp_path):
    """history() must list one entry per version with the OUTERMOST
    public mutator stamped as the operation — compact reads as
    'compact', not the overwrite it rides on."""
    t = LakeTable(spark, str(tmp_path / "hist"))
    t.create(events.repartition(3))
    t.append(events.limit(2))
    t.compact()
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert [e["operation"] for e in h] == ["create", "append", "compact"]
    assert h[1]["rows"] > h[0]["rows"]
    assert all(e["n_files"] >= 1 for e in h)


def test_crash_debris_invisible_to_readers_and_vacuumed(spark, events, tmp_path):
    """Crash consistency: a writer that dies mid-commit leaves (a) a
    torn temp manifest and (b) orphaned data files. Readers must never
    see either; the next commit must proceed; vacuum must sweep both."""
    path = str(tmp_path / "t")
    t = LakeTable(spark, path)
    t.create(events)
    before = t.read().count()

    # simulate the crash: torn (invalid-JSON) temp manifest + an
    # orphan parquet the dead writer had staged but never committed
    mdir = os.path.join(path, "_manifest")
    torn = os.path.join(mdir, ".v1.json.deadbeef.tmp")
    with open(torn, "w") as fh:
        fh.write('{"files": [')  # truncated mid-write
    orphan = os.path.join(path, "part-orphan-from-dead-writer.parquet")
    events.limit(1).toPandas().to_parquet(orphan)

    # readers: same rows, same versions — debris is invisible
    assert t.read().count() == before
    assert t.versions() == [0]

    # the next writer is unaffected by the torn tmp (fresh uuid name)
    t.append(events)
    assert t.read().count() == 2 * before

    deleted = t.vacuum(retain_last=1)
    assert torn in deleted and orphan in deleted
    assert not os.path.exists(torn) and not os.path.exists(orphan)
    # table still reads after the sweep
    assert t.read().count() == 2 * before


def test_quantizer_codebooks_roundtrip_through_lake_versions(spark, tmp_path):
    """Production maintenance story for the hierarchical quantizer:
    the coarse and fine codebooks are TABLES (maintained with the
    archive, versioned like any lake asset — the posture
    incremental_semantic_novelty's docstring assumes). Land both
    codebooks as LakeTable versions, reload them, and assert the
    reloaded codebooks drive the exact same assignment as the frames
    they were built from — codebook persistence can never drift the
    cells. Also prove an APPEND-evolved codebook (a re-trained fine
    level committed as the next version) changes assignment through
    time travel, i.e. yesterday's version still reproduces
    yesterday's cells."""
    from big_data_data_lake_spark.operators import similarity as sim
    from big_data_data_lake_spark.sources.metadata import LakeTable

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", sim.to_double("embedding").alias("v"))
    )
    coarse_rows = e.orderBy("vec_id").limit(4).select("v").collect()
    cassign = sim.assign_nearest_centroid(
        e, [r.v for r in coarse_rows], out_col="ccen"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("ccen").orderBy("vec_id")
    fine = (
        cassign.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("ccen", (F.col("rn") - 1).cast("int").alias("fcen"),
                F.col("v").alias("fv"))
    )

    # land both codebooks as lake tables
    ct = LakeTable(spark, str(tmp_path / "coarse_codebook"))
    ct.create(
        spark.createDataFrame(
            [(i, r.v) for i, r in enumerate(coarse_rows)], "cen int, cv array<double>"
        )
    )
    ft = LakeTable(spark, str(tmp_path / "fine_codebook"))
    v_fine0 = ft.create(fine)

    # reload and re-assign: identical cells
    reloaded_coarse = [
        r.cv for r in ct.read().orderBy("cen").collect()
    ]
    ca2 = sim.assign_nearest_centroid(e, reloaded_coarse, out_col="ccen")
    fa_direct = {
        (r.vec_id): (r.ccen, r.fcen)
        for r in sim.assign_fine_within_cell(cassign, fine).collect()
    }
    fa_reload = {
        (r.vec_id): (r.ccen, r.fcen)
        for r in sim.assign_fine_within_cell(
            ca2, ft.read(v_fine0).select("ccen", "fcen", "fv")
        ).collect()
    }
    assert fa_direct == fa_reload

    # retrain: append a third fine centroid per cell as a new version
    extra = (
        cassign.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 3)
        .select("ccen", F.lit(2).cast("int").alias("fcen"),
                F.col("v").alias("fv"))
    )
    v_fine1 = ft.append(extra)
    fa_new = {
        r.vec_id: (r.ccen, r.fcen)
        for r in sim.assign_fine_within_cell(
            ca2, ft.read(v_fine1).select("ccen", "fcen", "fv")
        ).collect()
    }
    # time travel to v0 still reproduces yesterday's cells exactly
    fa_old = {
        r.vec_id: (r.ccen, r.fcen)
        for r in sim.assign_fine_within_cell(
            ca2, ft.read(v_fine0).select("ccen", "fcen", "fv")
        ).collect()
    }
    assert fa_old == fa_direct
    assert fa_new != fa_direct  # the retrain is visible at the head
    # and the retrained assignment only ever uses fcen in {0,1,2}
    assert {f for _, f in fa_new.values()} <= {0, 1, 2}


def test_append_never_narrows_nullability(spark, tmp_path):
    """A non-nullable frame appending into a nullable table column
    must NOT narrow the committed schema to nullable=false (round-9
    advice): older committed files may hold nulls, and a later
    nullable append of the same shape must stay accepted regardless
    of append order."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    nullable_schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("k", StringType(), True),
        ]
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    # v0 holds an actual NULL in k under a nullable schema
    t.create(spark.createDataFrame([(1, None), (2, "b")], nullable_schema))

    # literal-built frames carry nullable=false — the exact shape the
    # narrowing bug was triggered by
    tight = spark.range(3, 4).select(
        F.col("id"), F.lit("c").alias("k")
    )
    assert not tight.schema["k"].nullable  # precondition: df IS narrow
    t.append(tight)

    # committed schema must still say nullable=true for k ...
    committed = StructType.fromJson(t.manifest()["schema_json"])
    assert committed["k"].nullable, "append narrowed the table schema"
    # ... the v0 null row must read back intact under the head schema
    rows = {r.id: r.k for r in t.read().collect()}
    assert rows == {1: None, 2: "b", 3: "c"}
    # ... and a nullable append afterwards stays accepted (no
    # order-dependent acceptance)
    t.append(spark.createDataFrame([(4, None)], nullable_schema))
    assert t.read().where(F.col("k").isNull()).count() == 2


def test_merge_schema_new_column_committed_nullable(spark, tmp_path):
    """merge_schema-new columns must commit nullable=true even when
    the appended frame's column is non-nullable: every pre-existing
    file reads back NULL for them."""
    from pyspark.sql.types import StructType

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(spark.range(2).select(F.col("id")))
    widened = spark.range(2, 4).select(
        F.col("id"), F.lit(7).cast("long").alias("extra")
    )
    assert not widened.schema["extra"].nullable
    t.append(widened, merge_schema=True)
    committed = StructType.fromJson(t.manifest()["schema_json"])
    assert committed["extra"].nullable
    got = {r.id: r.extra for r in t.read().collect()}
    assert got == {0: None, 1: None, 2: 7, 3: 7}
