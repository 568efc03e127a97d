"""Multimodal column handling (SURVEY §7 Phase 4): opaque binary
payloads (image/audio/video bytes) with typed metadata, processed by
Arrow-batched ``mapInPandas`` — the sanctioned Python seam for logic
built-in functions can't express.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises, ``extract_features``
computes deterministic byte-level features). Everything around the
stub — binary columns, Arrow batch transfer, output schema, partition
preservation — is the real production plumbing: swapping the stub for
PIL/ffmpeg changes only the function body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, blob_len int, first_byte int, checksum int"


def attach_blob(df: DataFrame, text_col: str = "text", out: str = "blob") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio
    bytes; in production this is the parquet BINARY column itself)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def decode_image(blob: bytes):
    """STUB — image decode requires codec libraries not present in
    this environment. The Spark-side seam (binary in, struct of
    features out via mapInPandas) is real and tested with
    ``extract_features``."""
    raise NotImplementedError(
        "image decode needs PIL/libjpeg; not available in this container"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Byte-level feature extraction over Arrow batches: length, first
    byte, additive checksum. Deterministic stand-in for a real decoder;
    batch shape and schema are production-identical."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "blob_len": blobs.map(len).astype("int32"),
                    "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "checksum": blobs.map(lambda b: int(sum(b)) % 256).astype("int32"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, resized binary"


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Image resize plumbing over Arrow batches. The pixel resample
    needs PIL (absent here), so the batch op produces a deterministic
    fake: the blob truncated/padded to target_w*target_h bytes — the
    schema, batch iterator, and output column shapes are exactly what
    the PIL-backed body would produce."""

    n = target_w * target_h

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "resized": blobs.map(lambda b: bytes(b[:n]).ljust(n, b"\0")),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 16,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Video frame sampling plumbing (1 row in → n_frames rows out —
    the flatMap shape a real ffmpeg-backed sampler has). Frames are
    deterministic equally-spaced byte slices of the blob standing in
    for decoded keyframes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    start = i * step
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(bytes(blob[start : start + frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)
