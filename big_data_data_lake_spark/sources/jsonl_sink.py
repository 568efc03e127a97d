"""Python DataSource WRITER: a JSON-lines audit sink with a real
two-phase commit protocol (SURVEY §2.1 S4's bronze-sink shape, on the
Spark 4 API surface the reader half of which is ``rest_source.py``).

Why this exists: the Python DataSource API has two halves, and a
"complete" engine should exercise both — ``rest_source.py`` covers
``DataSourceReader`` (S1), this covers ``DataSourceWriter``. The sink
is the reference's audit/bronze JSONL shape (producer.py writes
JSONL; SURVEY S4), reimplemented as a first-class ``format(...)``
target with the commit protocol Spark's own file sinks use:

- each TASK writes its rows to a uniquely-named file under
  ``<path>/_temporary/`` and returns the file name in its
  ``WriterCommitMessage`` — a failed/retried task's temp file is
  simply never committed, so speculative or retried tasks cannot
  double-write;
- the DRIVER's ``commit`` renames exactly the acknowledged temp files
  into ``<path>/`` and writes a ``_SUCCESS`` manifest (file list +
  row counts) — readers that gate on ``_SUCCESS`` never observe a
  half-written job;
- ``abort`` deletes the acknowledged temp files (best-effort; the
  ``_temporary`` dir is also re-cleared by the next overwrite).

Scale posture: ``path`` must be shared storage (HDFS/S3/NFS) so the
driver can see task output — the same assumption every manifest-based
sink here makes (sources/metadata.py). One file per task keeps the
rename metadata-scale; row data never moves through the driver.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

TEMP_DIR = "_temporary"
SUCCESS_FILE = "_SUCCESS"


class JsonlTaskCommit(WriterCommitMessage):
    """Per-task acknowledgement: which temp file holds the task's rows
    (picklable — travels executor -> driver)."""

    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").mode(...).save(path)`` after
    ``spark.dataSource.register(JsonlAuditDataSource)``.

    Modes: ``append`` adds files next to existing ones; ``overwrite``
    removes previously committed ``*.jsonl`` files at commit time (so
    a failed overwrite leaves the old data intact — commit is the
    atomicity point, exactly like ``LakeTable.overwrite``)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> "JsonlAuditWriter":
        return JsonlAuditWriter(self.options, schema, overwrite)


class JsonlAuditWriter(DataSourceWriter):
    def __init__(self, options: dict, schema, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_audit requires a save path")
        self.path = path
        self.overwrite = overwrite
        self.field_names = [f.name for f in schema.fields]

    # ------------------------------------------------------ executor side

    def write(self, iterator) -> JsonlTaskCommit:
        tmp_dir = os.path.join(self.path, TEMP_DIR)
        os.makedirs(tmp_dir, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        rows = 0
        with open(os.path.join(tmp_dir, fname), "w") as fh:
            for row in iterator:
                # default=str: timestamps/decimals serialize portably
                fh.write(
                    json.dumps(
                        {k: row[k] for k in self.field_names}, default=str
                    )
                )
                fh.write("\n")
                rows += 1
        return JsonlTaskCommit(fname, rows)

    # -------------------------------------------------------- driver side

    def commit(self, messages) -> None:
        tmp_dir = os.path.join(self.path, TEMP_DIR)
        # In append mode the new manifest must CARRY FORWARD the prior
        # committed file list — overwriting _SUCCESS with only this
        # job's files would orphan every earlier append for
        # manifest-gated readers.
        manifest = {"files": {}, "rows": 0}
        if not self.overwrite:
            try:
                with open(os.path.join(self.path, SUCCESS_FILE)) as fh:
                    prior = json.load(fh).get("files", {})
                manifest["files"].update(prior)
                manifest["rows"] = sum(prior.values())
            except (FileNotFoundError, json.JSONDecodeError):
                pass
        for m in messages:
            if m is None:  # defensive: speculative duplicates ack None
                continue
            os.rename(
                os.path.join(tmp_dir, m.filename),
                os.path.join(self.path, m.filename),
            )
            manifest["files"][m.filename] = m.rows
            manifest["rows"] += m.rows
        # _SUCCESS is the atomicity point: renames land first (new
        # uuid names never collide with old files), the manifest swap
        # flips readers to the new file set, and only THEN does
        # overwrite remove superseded files — a crash anywhere before
        # the manifest write leaves the previous commit fully
        # readable (old files + old _SUCCESS untouched); a crash
        # after it leaves at worst unreferenced stale files, which
        # the next overwrite sweeps.
        with open(os.path.join(self.path, SUCCESS_FILE), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        if self.overwrite:
            for old in os.listdir(self.path):
                if old.endswith(".jsonl") and old not in manifest["files"]:
                    os.remove(os.path.join(self.path, old))
        self._clear_temp(tmp_dir)

    def abort(self, messages) -> None:
        tmp_dir = os.path.join(self.path, TEMP_DIR)
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(tmp_dir, m.filename))
            except FileNotFoundError:
                pass
        self._clear_temp(tmp_dir)

    @staticmethod
    def _clear_temp(tmp_dir: str) -> None:
        try:
            # leftovers from unacknowledged (failed mid-write) tasks
            for f in os.listdir(tmp_dir):
                os.remove(os.path.join(tmp_dir, f))
            os.rmdir(tmp_dir)
        except OSError:
            pass
