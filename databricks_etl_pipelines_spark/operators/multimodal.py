"""Multimodal (binary) column plumbing: opaque bytes + typed metadata,
processed via Arrow-batched ``mapInPandas``.

Pattern for 100 TB image/audio/video tables:
  * store payloads as a ``binary`` column beside typed metadata columns
    (modality, format, width/height/duration …);
  * every transform (decode, resize, frame-sample, feature-extract) is a
    ``mapInPandas`` stage — Arrow moves the bytes to Python in columnar
    batches, numpy/PIL/ffmpeg-style libs process per batch, and the result
    is again (binary, metadata) so stages compose;
  * partition by size so batches fit executor memory
    (``spark.sql.files.maxPartitionBytes`` + ``maxRecordsPerBatch``).

The actual codec libraries are not available in this container, so
``decode_image`` is a clearly-marked stub; ``binary_stats`` implements the
real plumbing end-to-end (schema, batching, deterministic output) and is
oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_DOC_SCHEMA = (
    "doc_id bigint, payload binary, modality string, media_format string"
)

STATS_SCHEMA = "doc_id bigint, n_bytes bigint, payload_sha256 string"


def to_binary_docs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Wrap a text table as (id, binary payload, metadata) — the storage
    shape a real image/audio table would have."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.lit("utf-8").alias("media_format"),
    )


def binary_stats(docs: DataFrame) -> DataFrame:
    """Per-payload byte count + sha256 via mapInPandas (Arrow batches).

    Deterministic, so it differential-tests the whole multimodal path:
    binary encode → Arrow transfer → per-batch Python → typed result."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].apply(len).astype("int64"),
                    "payload_sha256": pdf["payload"].apply(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs.mapInPandas(stats, STATS_SCHEMA)


DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, features binary"
)


def decode_image(docs: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: image decode / feature extraction.

    The Spark-side contract (mapInPandas over binary batches → typed
    feature rows) is identical to ``binary_stats``; only the per-batch
    function body differs. No image codec libs exist in this container.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires codec libraries (PIL/cv2) not present in "
            "this environment; swap this body for the real decoder"
        )

    return docs.mapInPandas(_decode, DECODED_SCHEMA)
