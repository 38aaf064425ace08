"""Sequence packing: fill fixed-size token windows with whole documents.

LLM training consumes fixed-length context windows; feeding one short
document per window wastes most of it. Packing concatenates documents up
to the window budget ("sample packing" — the Raffel et al. 2020 T5 /
GPT-3 data-prep step). The distributed form here is PARTITION-LOCAL
greedy packing: each partition packs its own documents independently,
which is embarrassingly parallel and loses almost nothing vs a global
packer when partitions hold thousands of documents (waste is bounded by
one partial window per partition).

Scale shape: one deterministic hash repartition + in-partition sort, then
an Arrow-batched ``mapInPandas`` that never materializes more than one
partition's (id, n_tokens) pairs — document text itself is NOT moved; the
pack plan joins back to the corpus on doc id.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pack_id = packing-stream bucket * STRIDE + local pack index: globally
# unique without any cross-partition coordination.
_PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    window: int,
    n_partitions: int | None = None,
    split_oversized: bool = False,
    bucket_expr: F.Column | None = None,
) -> DataFrame:
    """Assign each document to a pack (training window) of ``window``
    tokens: returns (``id_col``, pack_id, pack_offset, n_tokens,
    frag_index, tok_start).

    Documents are split into ``n_partitions`` independent packing streams
    by a LOGICAL bucket (default ``pmod(xxhash64(id), n)``; pass
    ``bucket_expr`` to substitute e.g. the md5/Karp-Rabin cross-engine
    hash) and laid out greedily in id order within each stream; a
    document that would overflow the current window starts a new one.
    A document longer than ``window`` either gets a pack of its own
    (``split_oversized=False`` — callers truncate downstream) or is cut
    into window-sized fragments (``split_oversized=True``): each full
    fragment fills its own pack, and the tail remainder opens a pack that
    following documents can share. ``frag_index``/``tok_start`` tell the
    loader which token range of the document lands where (both 0 for
    unsplit documents).

    Pack ids derive from the bucket VALUE, not the physical partition, so
    the layout is a pure function of (ids, sizes, window, n, bucket_expr)
    — identical on any cluster size or shuffle setting, and replayable by
    a SQL engine when ``bucket_expr`` is cross-engine.
    """
    n = int(
        n_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(id_col), F.lit(n))
    )
    work = (
        df.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("bigint").alias("__nt"),
            bucket.cast("bigint").alias("__bkt"),
        )
        .repartition(n, "__bkt")
        .sortWithinPartitions("__bkt", id_col)
    )
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, pack_id bigint, "
        "pack_offset bigint, n_tokens bigint, frag_index int, "
        "tok_start bigint"
    )
    cols = [id_col, "pack_id", "pack_offset", "n_tokens", "frag_index",
            "tok_start"]

    def pack(batches):
        # streaming greedy fill: only (bucket, pack_idx, offset) carries
        # across Arrow batches, so memory stays one batch regardless of
        # partition size (rows arrive sorted by (bucket, id)); state
        # resets at each bucket boundary, so a partition may hold many
        # buckets without their streams interfering
        cur_bkt, pack_idx, offset = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc, nt, bkt in zip(
                pdf[id_col].tolist(),
                pdf["__nt"].tolist(),
                pdf["__bkt"].tolist(),
            ):
                nt = int(nt)
                if bkt != cur_bkt:
                    cur_bkt, pack_idx, offset = bkt, 0, 0
                base = int(bkt) * _PACK_STRIDE
                if split_oversized and nt > window:
                    if offset > 0:
                        pack_idx += 1
                        offset = 0
                    full, rem = divmod(nt, window)
                    for j in range(full):
                        rows.append(
                            (doc, base + pack_idx, 0, window, j, j * window)
                        )
                        pack_idx += 1
                    if rem:
                        rows.append(
                            (doc, base + pack_idx, 0, rem, full,
                             full * window)
                        )
                        offset = rem
                    continue
                if offset > 0 and offset + nt > window:
                    pack_idx += 1
                    offset = 0
                rows.append((doc, base + pack_idx, offset, nt, 0, 0))
                offset += nt
                if offset >= window:
                    pack_idx += 1
                    offset = 0
            yield pd.DataFrame(rows, columns=cols)

    return work.mapInPandas(pack, out_schema)


def packing_efficiency(packed: DataFrame, window: int) -> DataFrame:
    """One-row utilization report over a ``pack_sequences`` result:
    (n_packs, n_rows, total_tokens, fill_ratio). fill_ratio is
    total_tokens / (n_packs · window) — the fraction of the training
    window budget actually carrying data."""
    return packed.agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.count("*").alias("n_rows"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum("n_tokens")
            / (F.countDistinct("pack_id") * F.lit(window))
        ).alias("fill_ratio"),
    )


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    chunk_tokens: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Concatenate-then-chunk layout (the GPT-2/3 pretraining data-prep
    step): all documents' tokens are conceptually concatenated in
    ``id_col`` order and the stream is cut every ``chunk_tokens`` tokens;
    each document then occupies the half-open token range
    ``[tok_start, tok_start + n_tokens)`` and the chunk range
    ``[chunk_start, chunk_end]``. Unlike greedy whole-document packing
    (:func:`pack_sequences`) there is zero padding waste — documents
    straddle chunk boundaries by design.

    Returns (``id_col``, n_tokens, tok_start, chunk_start, chunk_end,
    n_chunks); zero-token documents get n_chunks = 0.

    Scale shape — a textbook distributed prefix scan with ONE exchange:
    (1) range-repartition + in-partition sort on ``id_col`` so partitions
    hold contiguous sorted id ranges; (2) one tiny per-partition
    token-sum aggregate (one row per partition) is collected and
    prefix-summed on the driver — bounded by the partition count, never
    by the data, the same bounded-collect contract as the managed table's
    bucket-id lists; (3) an Arrow ``mapInPandas`` adds each partition's
    broadcast base offset to a partition-local numpy cumsum. A
    ``Window.partitionBy(spark_partition_id())`` would compute the same
    thing but re-shuffle every row by pid hash (Catalyst cannot know pid
    is partition-local); the mapInPandas form provably cannot shuffle.
    The result is independent of the sampled range boundaries (contiguous
    ranges make every prefix identical), so the layout is deterministic
    for any ``n_partitions``.
    """
    import numpy as np

    n = int(
        n_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    work = (
        df.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("bigint").alias("__nt"),
        )
        .repartitionByRange(n, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # The materialization is load-bearing: repartitionByRange SAMPLES its
    # boundaries, so the per-partition sums collected below must describe
    # the very same partitioning the final plan reads. localCheckpoint
    # pins the actual RDD (stronger than the old persist: the sampling
    # can never re-run) and is invocation-scoped — the old persist leaked
    # into the session and could serve a later run through plan matching.
    # The checkpointed frame is tiny (id + one bigint per row). This
    # site deliberately does NOT route through session.invocation_pin:
    # under the "persist"/"none" strategies a recompute could RESAMPLE
    # the range boundaries out of sync with the collected sums —
    # compute-once here is correctness, not performance.
    work = work.localCheckpoint(eager=False)
    part_sums = {
        r["__pid"]: r["__s"]
        for r in work.groupBy("__pid").agg(F.sum("__nt").alias("__s")).collect()
    }
    base, offsets = 0, {}
    for pid in sorted(part_sums):
        offsets[pid] = base
        base += int(part_sums[pid])

    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, n_tokens bigint, "
        "tok_start bigint, chunk_start bigint, chunk_end bigint, "
        "n_chunks bigint"
    )
    c = int(chunk_tokens)

    def scan(batches):
        # only the running offset crosses Arrow batches: memory stays one
        # batch regardless of partition size (rows arrive id-sorted)
        running = None
        for pdf in batches:
            if not len(pdf):
                continue
            if running is None:
                running = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            nt = pdf["__nt"].to_numpy(dtype="int64")
            starts = running + np.concatenate(
                ([0], np.cumsum(nt[:-1], dtype="int64"))
            )
            running = int(starts[-1] + nt[-1])
            cs = starts // c
            ce = np.where(nt > 0, (starts + nt - 1) // c, cs)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_tokens": nt,
                    "tok_start": starts,
                    "chunk_start": cs,
                    "chunk_end": ce,
                    "n_chunks": np.where(nt > 0, ce - cs + 1, 0),
                }
            )
            yield out

    return work.mapInPandas(scan, out_schema)


def chunk_manifest(layout: DataFrame) -> DataFrame:
    """Per-chunk membership report over a :func:`pack_concat_chunks`
    layout: (chunk_id, n_docs, n_starting_docs, first_doc, last_doc).
    ``n_docs`` counts documents overlapping the chunk, ``n_starting_docs``
    those whose first token lands in it. Explode is output-bound: a
    document emits one row per chunk it touches."""
    spanned = layout.filter(F.col("n_chunks") > 0).select(
        F.col(layout.columns[0]).alias("__doc"),
        "chunk_start",
        F.explode(
            F.sequence(F.col("chunk_start"), F.col("chunk_end"))
        ).alias("chunk_id"),
    )
    return spanned.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.col("chunk_start") == F.col("chunk_id"), 1).otherwise(0)
        ).alias("n_starting_docs"),
        F.min("__doc").alias("first_doc"),
        F.max("__doc").alias("last_doc"),
    )
