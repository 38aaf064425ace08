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


HISTOGRAM_BINS = 16

FEATURES_SCHEMA = "doc_id bigint, n_bytes bigint, byte_histogram array<double>"


def byte_histogram_features(docs: DataFrame) -> DataFrame:
    """REAL feature extraction over binary payloads: normalized 16-bin byte
    histogram per payload, numpy-vectorized per Arrow batch.

    This is the exact shape of an image/audio featurizer (binary in, fixed-
    width float vector out) with a codec-free transform, so the distributed
    plumbing — batch sizing, vector schema, downstream use as an embedding
    column (similarity search, dedup) — is exercised for real."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            sizes = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                sizes.append(len(arr))
                h = np.bincount(arr >> 4, minlength=HISTOGRAM_BINS)
                hists.append((h / max(len(arr), 1)).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "byte_histogram": hists,
                }
            )

    return docs.mapInPandas(feats, FEATURES_SCHEMA)


CHUNK_SCHEMA = "doc_id bigint, chunk_id int, chunk_bytes bigint, energy double"


def sample_chunks(docs: DataFrame, n_chunks: int = 4) -> DataFrame:
    """Frame/segment sampling shape: split each payload into ``n_chunks``
    segments and emit one row per segment with a per-chunk statistic
    (mean byte value as the stand-in for frame energy). This is the
    video-frame-sample / audio-window pattern: one binary row fans out to
    N typed rows inside a single Arrow batch, no shuffle."""
    import numpy as np

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cids, sizes, energies = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                for i, seg in enumerate(np.array_split(arr, n_chunks)):
                    ids.append(doc_id)
                    cids.append(i)
                    sizes.append(len(seg))
                    energies.append(float(seg.mean()) if len(seg) else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_id": pd.Series(cids, dtype="int32"),
                    "chunk_bytes": pd.Series(sizes, dtype="int64"),
                    "energy": pd.Series(energies, dtype="float64"),
                }
            )

    return docs.mapInPandas(chunks, CHUNK_SCHEMA)


def downsample_payload(docs: DataFrame, factor: int = 4) -> DataFrame:
    """The resize/downsample stage shape: binary in → smaller binary out,
    same (id, payload, metadata) schema so stages COMPOSE (downsample →
    featurize → stats run as chained mapInPandas over the same Arrow
    batches). The codec-free transform keeps every k-th byte — the exact
    plumbing an image resize or audio resample uses, with numpy slicing
    standing in for the codec call."""
    import numpy as np

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].apply(
                lambda b: np.frombuffer(bytes(b), dtype=np.uint8)[::factor]
                .tobytes()
            )
            out["media_format"] = pdf["media_format"] + f";ds{factor}"
            yield out

    return docs.mapInPandas(shrink, BINARY_DOC_SCHEMA)


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
