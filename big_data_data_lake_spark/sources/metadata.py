"""Versioned lake-table metadata: the catalog layer the reference
lacks (its "tables" are bare HDFS directories with timestamps embedded
in filenames — consumer.py:121, dashboard.py:54-56 — so readers
re-derive table state by listing and string-parsing paths).

This is a minimal, dependency-free transaction-log design in the
spirit of Delta Lake's (Armbrust et al., VLDB'20 — see PAPERS.md):

- A table is a directory of immutable parquet data files plus a
  ``_manifest`` directory of JSON version files ``v<N>.json``.
- Each version file lists the *complete* set of data files visible at
  that version (snapshot isolation: readers pin one manifest, never a
  directory listing), the schema as Spark DDL, the partition columns,
  and per-file row counts / min-max stats for data skipping.
- Commits are atomic via write-temp + ``os.replace`` of the version
  file; the latest version is the highest N present.
- Readers get time travel (``version=``) and partition/stat pruning
  for free by selecting files from the manifest before handing Spark
  an explicit file list.

At 100 TB the same layout holds: manifests stay tiny (file-level
metadata only), appends add one manifest, and data files are never
rewritten in place. The public Delta/Iceberg formats are the
production swap; the access API here (``create/append/overwrite/
read``) matches that shape so the swap is mechanical.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def zorder_key(
    cols: list, lows: list, highs: list, bits: int = 12
) -> "F.Column":
    """Z-order (Morton) key: each column is min-max normalized to
    ``bits`` bits and the bits are interleaved, so sorting by the key
    co-locates rows that are close in EVERY dimension. Files written
    in key ranges then carry tight footer min/max on all the z-order
    columns at once — zone-map skipping works for predicates on any of
    them, where a plain sort helps only its leading column. Pure
    integer expressions, row-local."""
    top = (1 << bits) - 1
    norms = []
    for c, lo, hi in zip(cols, lows, highs):
        lo, hi = float(lo), float(hi)
        span = (hi - lo) or 1.0
        n = ((c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top)).cast("long")
        norms.append(F.least(F.greatest(n, F.lit(0)), F.lit(top)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, n in enumerate(norms):
            z = z + (
                F.shiftright(n, b).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (b * len(norms) + i))
            )
    return z


def _footer_stats(path: str) -> tuple[int, dict]:
    """Row count and per-column min/max from the parquet footer — no
    data read, no Spark job. Stats are kept for JSON-safe scalar types
    (int/float/str) and power manifest-side file skipping."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, (int, float, str)) or isinstance(lo, bool):
                continue
            name = col.path_in_schema
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return md.num_rows, {c: {"min": mins[c], "max": maxs[c]} for c in mins}


# Bloom probes: dedup.py's portable poly-hash (same MERSENNE_P
# modulus, same affine constants) drives k probes — the identical
# arithmetic runs as a Spark expression at build time (dedup._poly_hash)
# and in plain Python at lookup time (_poly_hash_py below, the
# deliberate Python twin: pruning must not need a JVM call). Constants
# are IMPORTED, not copied, so the planned xxhash64 swap documented in
# dedup.py cannot desynchronize build and probe and silently skip
# files that do contain the value.
from ..operators.dedup import MERSENNE_P as _BLOOM_P
from ..operators.dedup import MINHASH_A as _BLOOM_A
from ..operators.dedup import MINHASH_B as _BLOOM_B


def _poly_hash_py(s: str) -> int:
    """Python twin of dedup._poly_hash / POLY_HASH_SQL (same fold)."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % _BLOOM_P
    return h


def _pack_bits(positions, bits: int) -> str:
    """Set-bit positions -> base64 bitmap (bits/8 bytes — 1024 bits is
    172 b64 chars vs ~1.5 KB as a JSON int list; at 10^5 files per
    manifest the packing is what keeps blooms viable)."""
    import base64

    buf = bytearray(bits // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _norm_file_uri(p: str) -> str:
    """Canonicalize a path-or-URI for identity comparison: one URI
    parse + percent-decode on BOTH the ``input_file_name()`` output
    and the manifest-recorded path, so matching works for local paths,
    file:/// URIs, hdfs://nn/... and s3a://bucket/... alike (the
    file: scheme collapses to a plain path, since writers record local
    files without the scheme)."""
    from urllib.parse import unquote, urlparse

    u = urlparse(p)
    path = unquote(u.path)
    if u.scheme in ("", "file"):
        return path
    return f"{u.scheme}://{u.netloc}{path}"


def _bits_contain(b64: str, want) -> bool:
    import base64

    buf = base64.b64decode(b64)
    return all(buf[p >> 3] & (1 << (p & 7)) for p in want)


def _bloom_positions(value, bits: int, k: int) -> set[int]:
    h = _poly_hash_py(str(value))
    return {((_BLOOM_A[j] * h + _BLOOM_B[j]) % _BLOOM_P) % bits for j in range(k)}


def _append_compatible(df_schema, table_schema) -> bool:
    """Strict append check, modulo SAFE nullability narrowing: the
    same column names, order, and types are required, but a
    NON-nullable df column may append into a nullable table column
    (every non-null value fits). The reverse (nullable df into a
    non-nullable table column) stays rejected — it could land nulls a
    reader was promised never to see. Needed because frames built
    from literals/sketch expressions carry nullable=false where the
    parquet-read build path produced nullable=true."""
    if [f.name for f in df_schema.fields] != [f.name for f in table_schema.fields]:
        return False
    for fd, ft in zip(df_schema.fields, table_schema.fields):
        if fd.dataType != ft.dataType:
            return False
        if fd.nullable and not ft.nullable:
            return False
    return True


class ExpectationViolation(ValueError):
    """A write was rejected because expectation rules failed."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(f"expectations violated: {violations}")


def enforce_expectations(
    df: DataFrame, rules: dict[str, str], mode: str = "fail"
) -> tuple[DataFrame, dict[str, int]]:
    """Write-time quality gates (the CHECK-constraint / expectations
    pattern): ``rules`` maps rule name -> boolean SQL over the rows.
    NULL results satisfy a rule (SQL-standard CHECK semantics) in both
    the counting and the filtering path.

    mode='fail'  -> raise ExpectationViolation if any rule has
                    violations; nothing should be committed.
    mode='drop'  -> return (df filtered to passing rows, counts); the
                    caller records counts in the commit metadata.

    Violation counting is ONE aggregation over the batch and the
    collect is a single row of counters (metadata-scale, like the
    upsert bounds fetch). It is a second scan next to the write; at
    100 TB fold it into the write itself with ``df.observe()`` metrics
    — same counters, zero extra passes."""
    if mode not in ("fail", "drop"):
        raise ValueError(f"unknown expectation mode: {mode}")
    sat = {name: F.coalesce(F.expr(expr), F.lit(True)) for name, expr in rules.items()}
    counts_row = df.agg(
        *[
            F.sum((~c).cast("bigint")).cast("bigint").alias(name)
            for name, c in sat.items()
        ]
    ).collect()[0]
    violations = {name: int(counts_row[name] or 0) for name in rules}
    if mode == "fail":
        if any(violations.values()):
            raise ExpectationViolation({k: v for k, v in violations.items() if v})
        return df, violations
    clean = df
    for c in sat.values():
        clean = clean.where(c)
    return clean, violations


class LakeTable:
    """Handle to one versioned table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._mdir = os.path.join(path, MANIFEST_DIR)

    # ---------------------------------------------------------- manifests

    def versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        out = []
        for f in os.listdir(self._mdir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no manifest at {self._mdir}")
        return vs[-1]

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        with open(os.path.join(self._mdir, f"v{v}.json")) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """Commit history, newest last — the DESCRIBE HISTORY surface:
        one dict per version with the operation that produced it (the
        outermost public mutator, stamped at commit time), row/file
        counts, and partitioning. Driver-side metadata only (one small
        JSON per version) — no scan."""
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m.get("operation", "unknown"),
                    "rows": m["rows"],
                    "n_files": len(m["files"]),
                    "partition_by": ",".join(m["partition_by"]),
                }
            )
        return out

    def _commit(self, version: int, manifest: dict, operation: str) -> None:
        """Atomic put-if-absent of the version file. ``os.link`` fails
        with EEXIST when the target exists, so two writers racing on
        the same version cannot both win (an exists()-then-replace
        check would be TOCTOU: both pass the check, the second
        silently overwrites the first — a lost commit). This is the
        create-exclusive primitive Delta's log protocol requires.

        ``operation`` is stamped explicitly by each public mutator
        (compact/cluster_by forward their own name through overwrite)
        so history() reads "compact", not the "overwrite" it rides on
        — r4 advice: stack sniffing mislabeled commits whenever a
        CALLER function happened to share a mutator name, and paid
        per-commit source-file I/O."""
        manifest["operation"] = operation
        os.makedirs(self._mdir, exist_ok=True)
        tmp = os.path.join(self._mdir, f".v{version}.json.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        final = os.path.join(self._mdir, f"v{version}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise FileExistsError(
                f"concurrent commit of version {version} at {self.path}"
            ) from None
        finally:
            os.remove(tmp)

    # ------------------------------------------------------------- writes

    def _list_parquet(self) -> set[str]:
        out: set[str] = set()
        for root, dirs, names in os.walk(self.path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for n in names:
                if n.endswith(".parquet"):
                    out.add(os.path.join(root, n))
        return out

    def _write_files(self, df: DataFrame, partition_by: list[str]) -> list[dict]:
        """Write df as new immutable parquet files in the standard
        Hive partition layout (``<table>/k=v/part-*.parquet``; Spark
        UUIDs file names so appends never collide); return file-level
        metadata for the manifest. Files added to disk but referenced
        by no manifest are invisible to readers — the manifest, not
        the directory listing, is the source of truth. Each entry
        records its on-disk ``bytes`` so later copy-on-write commits
        can size their rewrite output from the manifest alone (no
        filesystem stat storm at 10^5 files)."""
        before = self._list_parquet()
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path)

        files: list[dict] = []
        for full in sorted(self._list_parquet() - before):
            pvals = {}
            rel = os.path.relpath(full, self.path)
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    pvals[k] = v
            rows, col_stats = _footer_stats(full)
            files.append(
                {
                    "path": full,
                    "rows": rows,
                    "bytes": os.path.getsize(full),
                    "partition": pvals,
                    "stats": col_stats,
                }
            )
        return files

    @staticmethod
    def _rewrite_partitions(touched: list[dict]) -> int:
        """Output-partition count for a copy-on-write rewrite, sized
        to the BYTES being replaced (guide: output files in the
        128 MB - 1 GB range). Rewrites flow through narrow plans
        (touched-file scan + broadcast anti/semi join + union with the
        incoming batch), so without this the output file count is an
        accident of the UNION's partition arithmetic — measured at
        sf0.1: a 12 MB / 5,000-row corpus landed as 64 part files and
        every subsequent read paid ~1 s of per-file + planning
        overhead (upsert 2.0 s, join-frame delete 3.0 s, accounting
        2.2 s — all dominated by file count, footer stats measured
        free). ``coalesce`` (never a shuffle) caps the count; it is a
        no-op when the plan already has fewer partitions. Sizing is
        scale-adaptive — bytes/target, not a constant — so a 100 TB
        table's multi-GB rewrite keeps thousands of write tasks while
        a point-update writes one file. Target is overridable via
        $SPARK_GRAFT_LAKE_TARGET_FILE_BYTES (bytes); files written by
        pre-r13 manifests lack ``bytes`` and fall back to a stat call.
        """
        target = int(
            os.environ.get("SPARK_GRAFT_LAKE_TARGET_FILE_BYTES", "0")
        ) or 128 * 1024 * 1024
        total = 0
        for f in touched:
            b = f.get("bytes")
            if b is None:
                try:
                    b = os.path.getsize(f["path"])
                except OSError:
                    b = 0
            total += int(b)
        return max(1, -(-total // target))

    @staticmethod
    def _plan_size_estimate(df: DataFrame) -> int:
        """Catalyst's size estimate for ``df``, or 0 when unknown.
        Guards upsert's rewrite sizing against the bulk-load shape
        (incoming batch >> touched files): a MERGE of a 1 TB batch
        into a table where it only touches 100 MB must not coalesce
        the whole batch into one write task. Catalyst reports
        ``defaultSizeInBytes`` (~Long.Max) when it cannot estimate —
        treated as unknown, never as a real size."""
        try:
            sz = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return 0
        return sz if 0 <= sz < (1 << 50) else 0

    def _new_manifest(
        self,
        df: DataFrame,
        files: list[dict],
        partition_by: list[str],
        extra: dict | None = None,
        schema=None,
    ) -> dict:
        """``schema`` overrides ``df.schema`` as the committed table
        schema — append() passes the nullability UNION of the previous
        table schema and the appended frame, because committing the
        frame's own (possibly narrower) nullability would apply a
        non-nullable schema to older null-bearing files and make
        append acceptance order-dependent (round-9 advice)."""
        schema = schema if schema is not None else df.schema
        out = {
            "schema_ddl": schema.simpleString(),  # human-readable
            "schema_json": schema.jsonValue(),  # exact reconstruction
            "partition_by": partition_by,
            "files": files,
            "rows": sum(f["rows"] for f in files),
        }
        if extra:
            out.update(extra)
        return out

    def _carry(self, prev: dict, extra: dict | None) -> dict | None:
        """Streaming replay metadata must outlive maintenance commits:
        the exactly-once guard in ``lake_table_sink`` reads
        ``batch_id`` from the LATEST manifest, so a compact/overwrite/
        upsert between micro-batches that dropped it would reset the
        high-water mark to -1 and let a replayed batch append twice.
        Every new manifest therefore carries the previous one's
        ``batch_id`` forward unless ``extra`` explicitly overrides."""
        out = {k: prev[k] for k in ("batch_id",) if k in prev}
        if extra:
            out.update(extra)
        return out or None

    def create(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        extra: dict | None = None,
        expectations: dict[str, str] | None = None,
        expect_mode: str = "fail",
    ) -> int:
        """Version 0: initial snapshot."""
        if self.versions():
            raise FileExistsError(f"table already exists at {self.path}")
        if expectations:
            df, stats = enforce_expectations(df, expectations, expect_mode)
            extra = {
                **(extra or {}),
                "expectations": {"mode": expect_mode, "violations": stats},
            }
        pb = partition_by or []
        files = self._write_files(df, pb)
        self._commit(0, self._new_manifest(df, files, pb, extra), "create")
        return 0

    def append(
        self,
        df: DataFrame,
        extra: dict | None = None,
        merge_schema: bool = False,
        expectations: dict[str, str] | None = None,
        expect_mode: str = "fail",
    ) -> int:
        """New version = previous file set + new files (no rewrite).

        ``merge_schema=True`` allows additive evolution: ``df`` may
        carry new columns (the manifest schema widens; old files read
        back with nulls for them), and may omit existing columns
        (filled with nulls on write). Type changes and column renames
        are rejected — those are rewrites, not appends.

        ``expectations`` gates the batch with named CHECK rules
        (enforce_expectations): 'fail' rejects the whole commit,
        'drop' admits passing rows and records violation counts in
        the committed manifest — an audit trail per version."""
        from pyspark.sql.types import StructType

        if expectations:
            df, stats = enforce_expectations(df, expectations, expect_mode)
            extra = {
                **(extra or {}),
                "expectations": {"mode": expect_mode, "violations": stats},
            }
        prev = self.manifest()
        prev_schema = StructType.fromJson(prev["schema_json"])
        if merge_schema:
            for f in prev_schema.fields:
                if f.name in df.columns:
                    if df.schema[f.name].dataType != f.dataType:
                        raise ValueError(
                            f"type change on {f.name} is not additive evolution"
                        )
                else:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            merged = StructType(
                list(prev_schema.fields)
                + [f for f in df.schema.fields if f.name not in prev_schema.names]
            )
            df = df.select([F.col(f.name) for f in merged.fields])
        elif not _append_compatible(df.schema, prev_schema):
            raise ValueError(
                "append schema differs from table schema; pass merge_schema=True "
                f"for additive evolution. table={prev_schema.simpleString()} "
                f"df={df.schema.simpleString()}"
            )
        files = self._write_files(df, prev["partition_by"])
        v = self.latest_version() + 1
        # Commit the per-field nullability UNION of the table schema
        # and the appended frame, never the frame's schema alone: a
        # non-nullable df appending into a nullable column must not
        # narrow the recorded schema (older committed files may hold
        # nulls, and acceptance of later nullable appends would become
        # order-dependent). merge_schema-new columns are forced
        # nullable — pre-existing files read back NULL for them.
        from pyspark.sql.types import StructField, StructType

        prev_nullable = {f.name: f.nullable for f in prev_schema.fields}
        committed = StructType(
            [
                StructField(
                    f.name,
                    f.dataType,
                    (
                        prev_nullable[f.name] or f.nullable
                        if f.name in prev_nullable
                        else True
                    ),
                    f.metadata,
                )
                for f in df.schema.fields
            ]
        )
        man = self._new_manifest(
            df,
            prev["files"] + files,
            prev["partition_by"],
            self._carry(prev, extra),
            schema=committed,
        )
        self._commit(v, man, "append")
        return v

    def overwrite(
        self,
        df: DataFrame,
        expectations: dict[str, str] | None = None,
        expect_mode: str = "fail",
        _operation: str = "overwrite",
    ) -> int:
        """New version replacing the visible file set; old files stay
        on disk so prior versions remain readable (``vacuum`` is the
        separate, explicitly destructive retirement step).
        ``expectations`` gates the batch exactly as in append.
        ``_operation`` lets maintenance mutators that ride on
        overwrite (compact, cluster_by) stamp their own name into
        history()."""
        extra = None
        if expectations:
            df, stats = enforce_expectations(df, expectations, expect_mode)
            extra = {"expectations": {"mode": expect_mode, "violations": stats}}
        prev = self.manifest()
        files = self._write_files(df, prev["partition_by"])
        v = self.latest_version() + 1
        self._commit(
            v,
            self._new_manifest(df, files, prev["partition_by"], self._carry(prev, extra)),
            _operation,
        )
        return v

    def add_bloom(self, col: str, bits: int = 1024, k: int = 4) -> int:
        """Maintenance commit attaching a per-file Bloom filter on
        ``col`` (int/long/string) — point-lookup file skipping for the
        case zone maps can't prune: high-cardinality keys scattered
        across files, where every file's min/max range covers every
        query. One Spark pass computes each file's set bit positions
        (k affine probes of the portable value hash); each file's
        bitmap is stored base64-packed in the manifest (bits/8 bytes
        per file). Files appended later simply lack a bloom and are
        never skipped. Lookups for NULL are unsupported (null rows
        set no bits)."""
        if k > len(_BLOOM_A):
            raise ValueError(f"k <= {len(_BLOOM_A)} supported")
        from pyspark.sql.types import StructType

        man = self.manifest()
        schema = StructType.fromJson(man["schema_json"])
        if schema[col].dataType.typeName() not in ("integer", "long", "string"):
            raise ValueError(f"bloom supports int/long/string columns, not {schema[col].dataType}")
        from ..operators.dedup import _poly_hash

        df = self._read_files(schema, man["files"]).select(
            F.input_file_name().alias("__f"), F.col(col).cast("string").alias("__v")
        )
        h = _poly_hash(F.col("__v"))
        probes = F.array(
            *[
                ((F.lit(_BLOOM_A[j]) * h + F.lit(_BLOOM_B[j])) % _BLOOM_P % bits).cast("int")
                for j in range(k)
            ]
        )
        per_file = (
            df.where(F.col("__v").isNotNull())
            .select("__f", F.explode(probes).alias("p"))
            .groupBy("__f")
            .agg(F.collect_set("p").alias("bits"))
            .collect()  # metadata-scale: files x <= `bits` ints
        )
        # input_file_name() returns a URI (file:///x, hdfs://nn/x,
        # s3a://bkt/x, possibly percent-encoded); manifest paths are
        # whatever the writer recorded. Normalize BOTH sides through
        # the same URI parse + unquote so the match works on every
        # filesystem — a silent mismatch here would attach bitmaps to
        # zero files and turn bloom_eq pruning into a no-op.
        by_path = {
            _norm_file_uri(r["__f"]): _pack_bits(r["bits"], bits) for r in per_file
        }
        manifest_norms = {_norm_file_uri(f["path"]) for f in man["files"]}
        unmatched = set(by_path) - manifest_norms
        if unmatched:
            raise RuntimeError(
                "add_bloom: scanned file(s) do not match any manifest path "
                f"after URI normalization: {sorted(unmatched)[:3]}"
            )
        files = []
        for f in man["files"]:
            nf = dict(f)
            # files absent from by_path had only null values: an empty
            # bitmap (no bits set) is the CORRECT filter for them —
            # bloom_eq rightly skips a file that cannot contain any
            # non-null value
            bitmap = by_path.get(_norm_file_uri(f["path"]), _pack_bits([], bits))
            nf["bloom"] = {**nf.get("bloom", {}), col: bitmap}
            files.append(nf)
        new_man = dict(man)
        new_man["files"] = files
        new_man.setdefault("bloom_meta", {})
        new_man["bloom_meta"] = {**new_man["bloom_meta"], col: {"bits": bits, "k": k}}
        v = self.latest_version() + 1
        self._commit(v, new_man, "add_bloom")
        return v

    # -------------------------------------------------------------- reads

    def read(
        self,
        version: int | None = None,
        partition_filter: dict[str, str] | None = None,
        stat_filter: dict[str, tuple] | None = None,
        bloom_eq: dict | None = None,
    ) -> DataFrame:
        """Snapshot read pinned to one manifest. ``partition_filter``
        prunes files manifest-side, so Spark never lists or opens
        non-matching files; ``stat_filter`` maps column -> (lo, hi)
        and skips files whose footer min/max range cannot intersect —
        zone-map data skipping. ``bloom_eq`` maps column -> value and
        skips files whose Bloom filter (see add_bloom) proves the
        value absent. All are pruning-only: callers still apply the
        exact predicate to the returned DataFrame."""
        from pyspark.sql.types import StructType

        man = self.manifest(version)
        schema = StructType.fromJson(man["schema_json"])
        files = man["files"]
        if bloom_eq:
            for col, val in bloom_eq.items():
                bm = man.get("bloom_meta", {}).get(col)
                if not bm:
                    continue  # no bloom on this column -> cannot skip
                want = _bloom_positions(val, bm["bits"], bm["k"])
                files = [
                    f
                    for f in files
                    if f.get("bloom", {}).get(col) is None
                    or _bits_contain(f["bloom"][col], want)
                ]
        if partition_filter:
            files = [
                f
                for f in files
                if all(f["partition"].get(k) == str(v) for k, v in partition_filter.items())
            ]
        if stat_filter:
            def may_match(f: dict) -> bool:
                for col, (lo, hi) in stat_filter.items():
                    st = f.get("stats", {}).get(col)
                    if st is None:
                        continue  # no stats -> cannot skip
                    if (hi is not None and st["min"] > hi) or (
                        lo is not None and st["max"] < lo
                    ):
                        return False
                return True

            files = [f for f in files if may_match(f)]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self._read_files(schema, files)

    @staticmethod
    def _base_of(path: str, partition_cols: list[str]) -> str:
        """The partition-discovery base for one data file: the path up
        to (excluding) its hive ``k=v`` segments, or the file's
        directory when unpartitioned. Anchored on the file's OWN
        recorded partition columns from the manifest (in layout
        order), never on a whole-path scan for ``=`` — a table rooted
        under a directory with ``=`` in its name (``/data/run=3/tbl``)
        must not yield a truncated basePath and a spurious inferred
        column (advisor finding, r5). Derived from the FILE path, not
        the table root, so a manifest may reference files outside the
        table directory (shallow clones) and partition-value inference
        still works per file."""
        dirs = path.split(os.sep)[:-1]
        n = len(partition_cols)
        if n and len(dirs) >= n and all(
            seg.startswith(col + "=")
            for seg, col in zip(dirs[-n:], partition_cols)
        ):
            return os.sep.join(dirs[:-n])
        return os.path.dirname(path)

    def _read_files(self, schema, files: list[dict]) -> DataFrame:
        """Read a manifest file list back to the declared schema:
        mergeSchema tolerates files that pre-date evolved columns,
        then column order and partition-column types are pinned back
        (path-derived partition values are inferred; columns newer
        than a file read back as nulls). Every internal reader of
        manifest files — read() and upsert()'s touched-file path —
        must go through this, or a schema-evolved table breaks them.

        Files are grouped by their partition-discovery base
        (``_base_of``) and each group read with its own basePath: a
        shallow clone's manifest references the source table's files
        by absolute path, so a single table-rooted basePath would
        reject them. One read per distinct root (>= 1, tiny), unioned
        by name."""
        by_base: dict[str, list[str]] = {}
        for f in files:
            pcols = list(f.get("partition", {}).keys())
            by_base.setdefault(self._base_of(f["path"], pcols), []).append(
                f["path"]
            )
        frames = []
        for base, paths in sorted(by_base.items()):
            df = (
                self.spark.read.option("basePath", base)
                .option("mergeSchema", "true")
                .parquet(*paths)
            )
            cols = [
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
            frames.append(df.select(cols))
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    def row_count(self, version: int | None = None) -> int:
        """Manifest-only row count — answers count(*) without touching
        a single data file."""
        return self.manifest(version)["rows"]

    # -------------------------------------------------------- maintenance

    def compact(self, files_per_partition: int = 1) -> int:
        """Bin-pack the current snapshot into ``files_per_partition``
        files per partition (streaming sinks leave one small file per
        micro-batch — the classic small-file problem). Produces a new
        version; old versions stay readable until ``vacuum``."""
        man = self.manifest()
        df = self.read()
        pb = man["partition_by"]
        if pb:
            df = df.repartition(files_per_partition, *pb)
        else:
            df = df.repartition(files_per_partition)
        return self.overwrite(df, _operation="compact")

    def cluster_by(self, cols: list[str], n_files: int = 16, bits: int = 12) -> int:
        """Rewrite the current snapshot z-ordered on ``cols``: rows are
        range-partitioned by the interleaved Morton key into
        ``n_files`` files, giving every file a tight min/max envelope
        on ALL the clustering columns — ``read(stat_filter=...)`` then
        skips files for a predicate on any of them. This is the
        data-layout lever that makes a 100 TB point/range query read
        1/n_files of the table instead of all of it. Produces a new
        version (old versions stay readable); the min/max scan is one
        cheap aggregate over the snapshot."""
        df = self.read()
        bounds = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        key = zorder_key(
            [F.col(c) for c in cols],
            [bounds[f"lo_{c}"] for c in cols],
            [bounds[f"hi_{c}"] for c in cols],
            bits=bits,
        )
        clustered = (
            df.withColumn("__z", key)
            .repartitionByRange(n_files, "__z")
            .drop("__z")
        )
        return self.overwrite(clustered, _operation="cluster_by")

    def changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Rows in files ADDED between two versions — incremental
        consumption for downstream pipelines (process only what a
        micro-batch committed instead of re-reading the snapshot).
        Exact row-level CDC for append-only history; across an
        upsert/compact/overwrite the added files also contain
        carried-over survivor rows, so consumers of rewriting tables
        should treat it as file-level, not row-level, change data."""
        from pyspark.sql.types import StructType

        man_to = self.manifest(v_to)
        old_paths = {f["path"] for f in self.manifest(v_from)["files"]}
        added = [f for f in man_to["files"] if f["path"] not in old_paths]
        schema = StructType.fromJson(man_to["schema_json"])
        if not added:
            return self.spark.createDataFrame([], schema)
        return self._read_files(schema, added)

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Explicitly destructive: drop all but the last ``retain_last``
        versions and delete data files no surviving version references.
        Returns the deleted file paths."""
        vs = self.versions()
        keep_vs = vs[-retain_last:]
        live = set()
        for v in keep_vs:
            live.update(f["path"] for f in self.manifest(v)["files"])
        deleted = []
        for path in sorted(self._list_parquet() - live):
            os.remove(path)
            deleted.append(path)
        for v in vs[:-retain_last]:
            os.remove(os.path.join(self._mdir, f"v{v}.json"))
        # Crash debris: a writer that died between writing its temp
        # manifest and linking it leaves a ``.v*.tmp`` behind. Readers
        # never see it (versions() lists only ``v*.json``), but it
        # accumulates — vacuum is the documented no-concurrent-writer
        # maintenance window, so sweep them here. Orphaned DATA files
        # from the same crash are already covered by the
        # unreferenced-parquet sweep above.
        for f in os.listdir(self._mdir):
            if f.startswith(".v") and f.endswith(".tmp"):
                path = os.path.join(self._mdir, f)
                os.remove(path)
                deleted.append(path)
        return deleted

    def clone_to(self, dest: str) -> "LakeTable":
        """SHALLOW CLONE: create a new table at ``dest`` whose v0
        manifest references THIS table's current data files by
        absolute path — a metadata-only copy, zero data movement,
        which is how a dev/test environment gets a writable view of a
        100 TB production table in milliseconds. Writes to the clone
        land under the clone's own directory (per-file basePath
        resolution in ``_read_files`` keeps partition inference
        correct across the mixed roots); the source is never touched.

        Same hazard as Delta shallow clones, inherited deliberately:
        VACUUM on the SOURCE can retire files the clone still
        references — retain source versions for as long as clones of
        them live. The clone's own vacuum only ever deletes files
        under the clone's directory (``_list_parquet`` walks the
        clone root), so a clone cannot damage its source."""
        t = LakeTable(self.spark, dest)
        if t.versions():
            raise FileExistsError(f"table already exists at {dest}")
        man = dict(self.manifest())
        man.pop("operation", None)
        man["cloned_from"] = {"path": self.path, "version": self.latest_version()}
        t._commit(0, man, "clone")
        return t

    def restore(self, version: int) -> int:
        """RESTORE TABLE ... TO VERSION AS OF — roll the table back to
        a prior snapshot as a NEW commit (history is preserved; nothing
        is deleted, so a bad restore is itself restorable). The new
        manifest references the target version's files BY REFERENCE —
        a metadata-only operation, no data movement, which is what
        makes "undo the bad backfill on the 100 TB table" a
        millisecond commit rather than a rewrite. The streaming replay
        guard's ``batch_id`` is carried from the LATEST manifest (not
        the restore target): rolling data back must not roll the
        exactly-once high-water mark back with it, or the next
        micro-batch replay would double-append. A later ``vacuum``
        keeps the restored files alive as long as any retained
        manifest references them."""
        target = self.manifest(version)  # raises if the version is gone
        latest = self.manifest()
        man = dict(target)
        man.pop("operation", None)  # restamped by _commit
        carried = self._carry(latest, {"restored_from": version})
        if carried:
            man.update(carried)
        v = self.latest_version() + 1
        self._commit(v, man, "restore")
        return v

    def upsert(self, df: DataFrame, keys: list[str], extra: dict | None = None) -> int:
        """Copy-on-write MERGE: rows in ``df`` replace same-key rows;
        new keys append. Only files whose zone-map range on
        ``keys[0]`` can intersect the incoming key range are
        rewritten — untouched files carry over into the new manifest
        by reference, which is what keeps a point-update cheap on a
        100 TB table. Exactness comes from the anti-join; the stats
        pruning is a strict superset of the files that contain
        matches.

        NULL keys are matched null-safely (``<=>``): parquet footer
        min/max excludes nulls, so when the incoming batch carries a
        NULL key the zone-map cannot prove any file null-free and
        pruning is disabled for that commit — correctness over
        pruning; a plain equi anti-join would leave the stored
        NULL-key row in place and duplicate it on every upsert."""
        prev = self.manifest()
        k0 = keys[0]
        bounds = df.agg(
            F.min(k0).alias("lo"),
            F.max(k0).alias("hi"),
            F.max(F.col(k0).isNull()).alias("has_null"),
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        null_key_present = bool(bounds["has_null"])

        def may_contain(f: dict) -> bool:
            if null_key_present:
                return True  # footer stats exclude nulls: cannot prune
            st = f.get("stats", {}).get(k0)
            if st is None or lo is None:
                return True  # no stats -> must assume a match
            return not (st["min"] > hi or st["max"] < lo)

        touched = [f for f in prev["files"] if may_contain(f)]
        untouched = [f for f in prev["files"] if not may_contain(f)]

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(prev["schema_json"])
        if touched:
            # go through the evolved-schema read path: touched files
            # may pre-date added columns (a plain parquet read of them
            # would fail the declared-schema select)
            old = self._read_files(schema, touched)
            incoming = df.select(*keys)
            cond = [old[k].eqNullSafe(incoming[k]) for k in keys]
            base = old.join(incoming, on=cond, how="left_anti")
        else:
            base = self.spark.createDataFrame([], schema)
        # columns df lacks null-fill from the declared schema; new df
        # columns widen it (additive evolution, as in merge_schema
        # append) — the manifest schema is taken from the union, so an
        # upsert can never silently narrow the table
        rewritten = base.unionByName(df, allowMissingColumns=True)
        if touched:
            # size the rewrite to the bytes it replaces plus the
            # incoming batch's estimated bytes (the latter keeps a
            # bulk MERGE from collapsing into too few write tasks);
            # when nothing is touched the incoming frame keeps its own
            # partitioning — an all-new-keys upsert is append-shaped
            # and the caller controls its layout
            n_out = self._rewrite_partitions(
                touched
                + [{"bytes": self._plan_size_estimate(df), "path": ""}]
            )
            rewritten = rewritten.coalesce(n_out)
        new_files = self._write_files(rewritten, prev["partition_by"])
        v = self.latest_version() + 1
        self._commit(
            v,
            self._new_manifest(
                rewritten,
                untouched + new_files,
                prev["partition_by"],
                self._carry(prev, extra),
            ),
            "upsert",
        )
        return v

    def delete_where(self, cond: str, extra: dict | None = None) -> int:
        """Copy-on-write DELETE (the GDPR / right-to-be-forgotten
        primitive a training-data lake must have): remove every row
        where ``cond`` evaluates TRUE (SQL DELETE semantics — NULL
        keeps the row), producing a new manifest version. Prior
        versions still see the rows until ``vacuum`` physically
        retires their files — which is exactly the two-step
        Delta/Iceberg erasure story (logical delete now, physical
        on retention expiry).

        File-level pruning is predicate-exact, not zone-map-bound: one
        pushdown scan tags matching rows with ``input_file_name()``,
        and only files that actually contain a match are rewritten —
        every other file carries into the new manifest by reference.
        The hit list collects to the driver but is manifest-scale
        (file paths, not rows). On a 100 TB table a targeted delete
        therefore costs one filtered scan plus a rewrite of the few
        files holding the subject's rows."""
        prev = self.manifest()
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(prev["schema_json"])
        cond_col = F.expr(cond)
        probe = self._read_files(schema, prev["files"]).withColumn(
            "__file", F.input_file_name()
        )
        hits = {
            _norm_file_uri(r["__file"])
            for r in probe.filter(cond_col).select("__file").distinct().collect()
        }
        touched = [f for f in prev["files"] if _norm_file_uri(f["path"]) in hits]
        untouched = [f for f in prev["files"] if _norm_file_uri(f["path"]) not in hits]
        if not touched:
            return self.latest_version()  # no-op: nothing matched
        kept = self._read_files(schema, touched).filter(
            ~F.coalesce(F.expr(cond), F.lit(False))
        )
        # deletes only shrink: size output files to the touched bytes
        kept = kept.coalesce(self._rewrite_partitions(touched))
        new_files = self._write_files(kept, prev["partition_by"])
        v = self.latest_version() + 1
        self._commit(
            v,
            self._new_manifest(
                kept,
                untouched + new_files,
                prev["partition_by"],
                self._carry(prev, extra),
            ),
            "delete_where",
        )
        return v

    def delete_matching(
        self, df: DataFrame, keys: list[str], extra: dict | None = None
    ) -> int:
        """Copy-on-write DELETE keyed by a JOIN FRAME instead of a SQL
        predicate string: every stored row whose ``keys`` tuple
        null-safely equals a row of ``df`` is removed. This is the
        scale-safe sibling of :meth:`delete_where` — the id set stays
        a distributed DataFrame end to end, so a delete of millions of
        keys (boilerplate-heavy excision, GDPR subject batches) never
        serializes an IN-list through the driver or the SQL parser
        (r7 verdict item #3).

        Same two-step erasure story as ``delete_where``: prior
        versions still see the rows until ``vacuum``. File-level
        pruning is match-exact — one semi-join scan tagged with
        ``input_file_name()`` finds the files that actually contain a
        matching key; only those rewrite (via a null-safe anti-join),
        every other file carries into the new manifest by reference.
        Only the matched FILE PATHS collect to the driver
        (manifest-scale), never the keys. NULL keys match null-safely
        (``<=>``), the natural join-frame semantics — unlike SQL
        DELETE, a NULL key in ``df`` deletes stored NULL-key rows."""
        prev = self.manifest()
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(prev["schema_json"])
        incoming = df.select(*keys).dropDuplicates(keys)
        probe = self._read_files(schema, prev["files"]).withColumn(
            "__file", F.input_file_name()
        )
        semi_cond = [probe[k].eqNullSafe(incoming[k]) for k in keys]
        hits = {
            _norm_file_uri(r["__file"])
            for r in probe.join(incoming, on=semi_cond, how="left_semi")
            .select("__file")
            .distinct()
            .collect()
        }
        touched = [f for f in prev["files"] if _norm_file_uri(f["path"]) in hits]
        untouched = [
            f for f in prev["files"] if _norm_file_uri(f["path"]) not in hits
        ]
        if not touched:
            return self.latest_version()  # no-op: nothing matched
        old = self._read_files(schema, touched)
        anti_cond = [old[k].eqNullSafe(incoming[k]) for k in keys]
        kept = old.join(incoming, on=anti_cond, how="left_anti")
        # deletes only shrink: size output files to the touched bytes
        kept = kept.coalesce(self._rewrite_partitions(touched))
        new_files = self._write_files(kept, prev["partition_by"])
        v = self.latest_version() + 1
        self._commit(
            v,
            self._new_manifest(
                kept,
                untouched + new_files,
                prev["partition_by"],
                self._carry(prev, extra),
            ),
            "delete_matching",
        )
        return v

    SCD2_COLS = ("__valid_from", "__valid_to", "__is_current")

    def upsert_scd2(
        self,
        df: DataFrame,
        keys: list[str],
        change_ts: str,
        extra: dict | None = None,
    ) -> int:
        """Type-2 slowly-changing-dimension MERGE: instead of
        replacing a matched row (``upsert``'s latest-wins), the stored
        CURRENT row for each incoming key is CLOSED (``__valid_to`` =
        incoming ``change_ts``, ``__is_current`` = false) and the
        incoming row opens a new open-ended version. Point-in-time
        reads go through ``read_asof``; history is never destroyed,
        and unlike manifest time travel it survives VACUUM because the
        history lives in the DATA, not the version chain.

        First call on a table without the SCD2 columns bootstraps them
        (stored rows become current, valid from the epoch). Physically
        the same copy-on-write shape as ``upsert``: zone-map pruning on
        ``keys[0]`` rewrites only files that can contain a matched
        row; closed-history files outside the incoming key range carry
        over by reference — what keeps a daily dimension delta cheap
        when history is 100x the delta. NULL keys match null-safely,
        with pruning disabled for that commit (footer stats exclude
        nulls), exactly as in ``upsert``."""
        from pyspark.sql.types import StructType

        prev = self.manifest()
        schema = StructType.fromJson(prev["schema_json"])
        vf, vt, cur = self.SCD2_COLS
        k0 = keys[0]

        bounds = df.agg(
            F.min(k0).alias("lo"),
            F.max(k0).alias("hi"),
            F.max(F.col(k0).isNull()).alias("has_null"),
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        null_key_present = bool(bounds["has_null"])

        def may_contain(f: dict) -> bool:
            if null_key_present:
                return True
            st = f.get("stats", {}).get(k0)
            if st is None or lo is None:
                return True
            return not (st["min"] > hi or st["max"] < lo)

        bootstrapped = vf not in [x.name for x in schema.fields]
        # a bootstrap rewrites everything (every file gains the SCD2
        # columns); afterwards only key-range-matching files rewrite
        touched = [
            f for f in prev["files"] if bootstrapped or may_contain(f)
        ]
        untouched = [f for f in prev["files"] if f not in touched]

        stored = self._read_files(schema, touched) if touched else (
            self.spark.createDataFrame([], schema)
        )
        if bootstrapped:
            stored = stored.select(
                "*",
                F.timestamp_micros(F.lit(0)).alias(vf),
                F.lit(None).cast("timestamp").alias(vt),
                F.lit(True).alias(cur),
            )

        incoming = df.select(
            "*",
            F.col(change_ts).cast("timestamp").alias(vf),
            F.lit(None).cast("timestamp").alias(vt),
            F.lit(True).alias(cur),
        )
        # per-key close timestamp (max over the batch, so a batch with
        # several versions of one key closes the stored row once)
        close_ts = df.groupBy(*keys).agg(
            F.max(F.col(change_ts).cast("timestamp")).alias("__close_ts")
        )
        cond = [stored[k].eqNullSafe(close_ts[k]) for k in keys]
        joined = stored.join(F.broadcast(close_ts), on=cond, how="left")
        should_close = F.col(cur) & F.col("__close_ts").isNotNull()
        closed = joined.select(
            *[stored[c] for c in stored.columns if c not in (vt, cur)],
            F.when(should_close, F.col("__close_ts"))
            .otherwise(stored[vt])
            .alias(vt),
            F.when(should_close, F.lit(False)).otherwise(stored[cur]).alias(cur),
        )
        rewritten = closed.unionByName(incoming, allowMissingColumns=True)
        new_files = self._write_files(rewritten, prev["partition_by"])
        v = self.latest_version() + 1
        self._commit(
            v,
            self._new_manifest(
                rewritten,
                untouched + new_files,
                prev["partition_by"],
                self._carry(prev, extra),
            ),
            "upsert_scd2",
        )
        return v

    def read_asof(self, t, version: int | None = None) -> DataFrame:
        """Point-in-time view of an SCD2 table: rows valid at ``t``
        (``__valid_from <= t < __valid_to``, open interval rows
        included)."""
        vf, vt, _ = self.SCD2_COLS
        df = self.read(version)
        tt = F.lit(t).cast("timestamp")
        return df.where(
            (F.col(vf) <= tt) & (F.col(vt).isNull() | (F.col(vt) > tt))
        )
