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

Codec libraries (PIL/cv2/ffmpeg) are not available in this container, so
``decode_image`` implements the one mainstream raster format decodable in
pure numpy — uncompressed 24-bit BMP — for real (header parse, stride
padding, bottom-up row order, BGR→RGB), and raises ValueError for any
other codec. ``binary_stats``/``byte_histogram_features``/``sample_chunks``
exercise the same plumbing codec-free.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.session import invocation_pin

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

# ---------------------------------------------------------------------------
# Real image decode: uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB),
# pure numpy — the one mainstream raster format decodable without codec
# libraries. Format reference: the public Windows BMP spec (14-byte file
# header; 40-byte DIB header; pixel rows bottom-up unless height < 0, each
# row padded to a 4-byte boundary; samples stored B,G,R).
# Compressed formats (PNG/JPEG) still need real codec libs; swap the
# per-batch body for PIL/cv2 where available — the Spark-side contract
# (mapInPandas over binary batches → typed rows) is unchanged.
# ---------------------------------------------------------------------------

_BMP_HEADER_LEN = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def bmp_encode(rgb) -> bytes:
    """Serialize an (h, w, 3) uint8 top-down RGB array as a 24-bit BMP."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError(f"expected 3 channels, got {c}")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = rows.tobytes()
    size = _BMP_HEADER_LEN + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + _BMP_HEADER_LEN.to_bytes(4, "little")  # pixel-data offset
        + (40).to_bytes(4, "little")             # DIB header size
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)   # positive: bottom-up
        + (1).to_bytes(2, "little")              # planes
        + (24).to_bytes(2, "little")             # bits per pixel
        + (0).to_bytes(4, "little")              # BI_RGB (uncompressed)
        + len(body).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4          # ppm + palette fields
    )
    return header + body


def bmp_decode(buf: bytes):
    """Parse a 24-bit BI_RGB BMP into an (h, w, 3) uint8 top-down RGB
    array. Raises ValueError on anything that isn't an uncompressed
    24-bit BMP (the honest failure mode for unsupported codecs)."""
    import numpy as np

    buf = bytes(buf)
    if len(buf) < _BMP_HEADER_LEN or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={comp}); "
            "only uncompressed 24-bit BI_RGB is decodable without codec libs"
        )
    top_down, h = h < 0, abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) // 4 * 4
    if len(buf) < pix_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(docs: DataFrame) -> DataFrame:
    """Image decode stage: binary BMP payloads → typed pixel rows
    (width, height, channels, features = raw top-down row-major RGB bytes).

    Real decode, no stub: 24-bit uncompressed BMPs are parsed with numpy
    per Arrow batch (``bmp_decode``). Unsupported/corrupt payloads raise —
    route quarantine-vs-fail policy with a filter stage upstream."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for b in pdf["payload"]:
                rgb = bmp_decode(bytes(b))
                heights.append(rgb.shape[0])
                widths.append(rgb.shape[1])
                feats.append(rgb.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "channels": pd.Series([3] * len(widths), dtype="int32"),
                    "features": feats,
                }
            )

    return docs.mapInPandas(_decode, DECODED_SCHEMA)


CHANNEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "r_sum bigint, g_sum bigint, b_sum bigint, pos_checksum bigint"
)


def decoded_channel_stats(decoded: DataFrame) -> DataFrame:
    """Per-image channel statistics over decoded pixel buffers — the
    feature-extract stage chained after decode (decode → stats compose as
    two mapInPandas over the same Arrow batches, no shuffle).

    ``pos_checksum`` = Σ_k k·(R+G+B)(k) over top-down row-major pixel
    index k: channel sums alone are permutation-invariant and would let a
    row-order (bottom-up) decode bug pass; the position weighting pins the
    pixel ORDER too."""
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, poss = [], []
            for b in pdf["features"]:
                px = np.frombuffer(bytes(b), dtype=np.uint8).reshape(-1, 3)
                sums.append(px.sum(axis=0, dtype=np.int64))
                tot = px.sum(axis=1, dtype=np.int64)
                poss.append(int((np.arange(len(tot)) * tot).sum()))
            arr = (
                np.stack(sums)
                if sums
                else np.zeros((0, 3), dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "channels": pdf["channels"],
                    "r_sum": pd.Series(arr[:, 0], dtype="int64"),
                    "g_sum": pd.Series(arr[:, 1], dtype="int64"),
                    "b_sum": pd.Series(arr[:, 2], dtype="int64"),
                    "pos_checksum": pd.Series(poss, dtype="int64"),
                }
            )

    return decoded.mapInPandas(_stats, CHANNEL_STATS_SCHEMA)


def synthetic_bmp_images(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP test fixtures: for each id, a small 24-bit image
    whose pixel (k = y*width + x, top-down row-major) channels are

        R(k) = (id*7  + 3k)  % 256
        G(k) = (id*13 + 5k)  % 256
        B(k) = (id*31 + 11k) % 256

    with width = 4 + id % 5, height = 3 + id % 4. Closed-form content
    means an oracle can compute any decoded statistic WITHOUT a decoder —
    the encode→decode round trip is what's under test."""
    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                k = np.arange(w * h, dtype=np.int64)
                rgb = np.stack(
                    [
                        (i * 7 + 3 * k) % 256,
                        (i * 13 + 5 * k) % 256,
                        (i * 31 + 11 * k) % 256,
                    ],
                    axis=-1,
                ).reshape(h, w, 3)
                payloads.append(bmp_encode(rgb))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "modality": ["image"] * len(payloads),
                    "media_format": ["bmp"] * len(payloads),
                }
            )

    return ids.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _make, BINARY_DOC_SCHEMA
    )


PATCH_EMB_SCHEMA = "doc_id bigint, dim int, val double"


def patch_embeddings(decoded: DataFrame, grid: int = 2) -> DataFrame:
    """Image → embedding: a ``grid×grid`` patch-mean feature vector per
    channel (dim = (patch_y·grid + patch_x)·3 + channel), emitted SPARSE
    as (doc_id, dim, val) rows so retrieval stays a relational join —
    the same representation the text hash-embedder uses.

    Patch boundaries are arithmetic, not array_split: pixel column x
    belongs to patch (grid·x)//w (and likewise rows), so an oracle can
    replay the exact assignment. Means are exact-integer sums divided
    once in float64 — bit-identical across engines. Vectorized numpy per
    Arrow batch; composes after ``decode_image`` with no shuffle."""
    import numpy as np

    def _emb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_dim, out_val = [], [], []
            for doc, w, h, feat in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["features"]
            ):
                w, h = int(w), int(h)
                if grid > w or grid > h:
                    # a grid finer than the image would make some patch
                    # empty (c = 0) and die in a ZeroDivisionError buried
                    # in a Py4J stack — fail with the actual cause instead
                    raise ValueError(
                        f"patch_embeddings: grid={grid} exceeds image "
                        f"dimensions {w}x{h} for doc_id={doc!r} — "
                        "every patch needs at least one pixel"
                    )
                rgb = (
                    np.frombuffer(bytes(feat), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                xs = (grid * np.arange(w)) // w
                ys = (grid * np.arange(h)) // h
                for py in range(grid):
                    for px in range(grid):
                        block = rgb[ys == py][:, xs == px, :]
                        c = block.shape[0] * block.shape[1]
                        sums = block.reshape(-1, 3).sum(axis=0)
                        for ch in range(3):
                            out_doc.append(int(doc))
                            out_dim.append((py * grid + px) * 3 + ch)
                            out_val.append(sums[ch] / c)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "dim": pd.Series(out_dim, dtype="int32"),
                    "val": pd.Series(out_val, dtype="float64"),
                }
            )

    return decoded.mapInPandas(_emb, PATCH_EMB_SCHEMA)


AHASH_SCHEMA = (
    "doc_id bigint, n_bytes bigint, "
    "b0 bigint, b1 bigint, b2 bigint, b3 bigint"
)

AHASH_BITS = 64
AHASH_BANDS = 4


def ahash_features(docs: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over binary payloads — the
    classic image near-duplicate fingerprint (mean-threshold bitmap of a
    downsampled grid), applied codec-free to the raw byte stream: 64
    strided sample positions p_i = ⌊i·L/64⌋ stand in for the 8×8
    downsampled grid, bit_i = (byte_i > mean). The mean comparison runs
    as exact integers (byte·64 > Σbytes — no division), so every bit is
    engine-replayable. Bits pack into 4 big-endian 16-bit band values:
    the LSH banding key for :func:`ahash_neardup_pairs` AND a compact
    4×int64 storage shape (a real pHash deployment stores exactly such
    words per image).

    Numpy-vectorized per Arrow batch like every featurizer here; with a
    real codec the byte stream would be the decoded grayscale grid —
    the sampling/threshold/packing stages are identical.

    EMPTY payloads are DROPPED (no fingerprint row — a zero-byte blob
    has no mean to threshold): callers joining fingerprints back must
    either pre-filter empties (as multimodal_phash_neardup does) or
    expect the missing rows."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, bands = [], [], [[], [], [], []]
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    continue
                # strided positions ⌊i·L/64⌋ need i·L/64 < L, true for
                # i < 64; dtype int64 avoids overflow for any payload
                idx = (
                    np.arange(AHASH_BITS, dtype=np.int64) * len(arr)
                ) // AHASH_BITS
                vals = arr[idx].astype(np.int64)
                total = int(vals.sum())
                bits = (vals * AHASH_BITS > total).astype(np.int64)
                ids.append(int(doc_id))
                sizes.append(len(arr))
                w = AHASH_BITS // AHASH_BANDS
                for k in range(AHASH_BANDS):
                    seg = bits[k * w:(k + 1) * w]
                    val = 0
                    for bit in seg:
                        val = val * 2 + int(bit)
                    bands[k].append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "b0": pd.Series(bands[0], dtype="int64"),
                    "b1": pd.Series(bands[1], dtype="int64"),
                    "b2": pd.Series(bands[2], dtype="int64"),
                    "b3": pd.Series(bands[3], dtype="int64"),
                }
            )

    return docs.mapInPandas(feats, AHASH_SCHEMA)


def ahash_neardup_pairs(
    feats: DataFrame, max_hamming: int = 8
) -> DataFrame:
    """Banded-LSH near-duplicate pairs over aHash fingerprints: two
    payloads within ``max_hamming`` of each other on 64 bits must agree
    EXACTLY on at least one 16-bit band whenever max_hamming < 4·... —
    strictly: differing in ≤ max_hamming bits, the pigeonhole puts some
    band at ≤ ⌊max_hamming/4⌋ differing bits, so recall is partial for
    max_hamming ≥ 4 but candidate generation never scans all pairs —
    the standard Hamming-LSH tradeoff (band equality = probe key).
    Candidates equi-join per band, dedup, then the exact 64-bit Hamming
    distance (XOR + popcount on the 4 band words) filters to
    ``hamming <= max_hamming``.

    Scale shape: one explode to 4 band rows per doc, one shuffle on
    (band index, band value), pair dedup, a broadcast-friendly feature
    join back — never O(n²)."""
    # Pinned (r15): feats feeds both self-join sides of the band probe
    # AND both feature join-backs — unpinned, the Arrow mapInPandas
    # fingerprint pass (the dominant cost, a Python-boundary scan)
    # executed once per reference (4× compiled). One 4-int row per doc;
    # invocation-scoped lazy checkpoint.
    feats = feats.transform(invocation_pin)
    bands = feats.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "k", "band_val"
        ),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("c"),
            on=[
                F.col("a.k") == F.col("c.k"),
                F.col("a.band_val") == F.col("c.band_val"),
                F.col("a.doc_id") < F.col("c.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(AHASH_BANDS)],
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"c{k}") for k in range(AHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"c{k}")))
        for k in range(AHASH_BANDS)
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a", "doc_b", hamming.cast("bigint").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )
