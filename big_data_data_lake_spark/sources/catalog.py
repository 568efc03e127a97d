"""Table catalog over the parquet lake.

The reference treats HDFS directories as tables with filename-embedded
timestamps as the only metadata (consumer.py:121, dashboard.py:54-56).
Here a table is a parquet path registered in the Spark catalog as a
temp view — columnar scans, predicate pushdown, and column pruning for
free. At 100 TB these would be Delta/Iceberg tables partitioned by
ingest date; the access API is identical (``load_table`` /
``spark.table``), so the swap is a one-liner where the jars exist.

Source-operator coverage (SURVEY §2.1):
- S8/S9 parquet read (multi-file union is implicit in a directory scan)
- S6 option'd CSV (``read_csv`` below: quotechar, column pruning)
- S7 JSONL with explicit schema (``read_jsonl``)
- S11 pathGlobFilter
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one lake table; Catalyst prunes columns/filters.

    ``events.ts`` is parquet TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as a raw nanos
    long, re-typed here to a microsecond timestamp (integer ``div`` so
    no double round-trip) — byte-identical to DuckDB's ns→us read.

    Naive parquet timestamps (``isAdjustedToUTC=false`` — how the
    current testdata is written) infer as TIMESTAMP_NTZ under Spark 4
    defaults, which epoch functions (``unix_micros`` & co.) reject.
    Normalize NTZ → TIMESTAMP here: under a UTC session timezone the
    cast is bit-identical to DuckDB's naive-timestamp semantics, and it
    keeps the engine independent of the caller's
    ``inferTimestampNTZ`` setting.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every lake table as a temp view so SQL entry points work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    quote: str = '"',
    header: bool = True,
    glob: str | None = None,
) -> DataFrame:
    """CSV source with the reference's dimension-table options.

    Mirrors the metadata read at consumer.py:31-37 /
    process_silver.py:233-238: single-quote ``quotechar``, explicit
    column pruning (``usecols``), tolerant parsing. Column pruning is
    expressed as a select so Catalyst pushes it into the scan.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("quote", quote)
        .option("mode", "PERMISSIVE")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.csv(path)
    if columns:
        df = df.select(*columns)
    return df


def read_jsonl(spark: SparkSession, path: str, schema=None, glob: str | None = None) -> DataFrame:
    """JSON-Lines source (bronze zone shape, process_silver.py:74-100).

    Always pass a schema in production — inference is a full extra pass.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """ORC source — the second columnar format Spark ships natively.

    Beyond the reference's surface (its lake is parquet-only): kept
    thin because ORC shares parquet's scan behaviors (column pruning,
    predicate pushdown into stripe/row-group stats), so every
    downstream operator is format-agnostic. Avro, by contrast, needs
    the external spark-avro jar (org.apache.spark:spark-avro_2.13) —
    not in this container, so it is documented here rather than
    half-implemented.
    """
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default codec; snappy via spark.sql.orc.compression.codec)."""
    df.write.mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Binary-file source (``binaryFile`` format): one row per file
    with (path, modificationTime, length, content) — the ingest edge
    for the multimodal pipeline (operators/multimodal.py decodes the
    ``content`` byte column into images/audio/frames downstream).

    ``glob`` maps to pathGlobFilter (e.g. ``*.ppm``); ``max_bytes``
    filters oversized blobs BY the scan's length column so the filter
    is evaluated before content lands in memory. At 100 TB of media,
    partition the directory layout by ingest date and size-bucket so
    Spark's file listing parallelizes and no task deserializes a
    multi-GB blob; spark.sql.files.maxPartitionBytes governs batch
    packing of small files into tasks."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
