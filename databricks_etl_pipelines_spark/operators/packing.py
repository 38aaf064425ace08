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

# pack_id = spark_partition_id * STRIDE + local pack index: globally unique
# without any cross-partition coordination.
_PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    window: int,
    n_partitions: int | None = None,
    split_oversized: bool = False,
) -> DataFrame:
    """Assign each document to a pack (training window) of ``window``
    tokens: returns (``id_col``, pack_id, pack_offset, n_tokens,
    frag_index, tok_start).

    Documents are laid out greedily in hash order within each partition;
    a document that would overflow the current window starts a new one.
    A document longer than ``window`` either gets a pack of its own
    (``split_oversized=False`` — callers truncate downstream) or is cut
    into window-sized fragments (``split_oversized=True``): each full
    fragment fills its own pack, and the tail remainder opens a pack that
    following documents can share. ``frag_index``/``tok_start`` tell the
    loader which token range of the document lands where (both 0 for
    unsplit documents).

    Deterministic for a fixed ``n_partitions``: the hash repartition and
    in-partition sort pin both membership and order.
    """
    n = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    work = (
        df.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("bigint").alias("__nt"),
        )
        .repartition(int(n), F.pmod(F.xxhash64(id_col), F.lit(int(n))))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, pack_id bigint, "
        "pack_offset bigint, n_tokens bigint, frag_index int, "
        "tok_start bigint"
    )
    cols = [id_col, "pack_id", "pack_offset", "n_tokens", "frag_index",
            "tok_start"]

    def pack(batches):
        # streaming greedy fill: only (pack_idx, offset) carries across
        # Arrow batches, so memory stays one batch regardless of partition
        # size (documents arrive pre-sorted by the in-partition sort)
        pack_idx, offset = 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = pid * _PACK_STRIDE
            rows = []
            for doc, nt in zip(pdf[id_col].tolist(), pdf["__nt"].tolist()):
                nt = int(nt)
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
