"""Join combinators (SURVEY §2.3 J1-J4 + full equi-join surface).

The reference implies joins (MERGE's equi-join, map-literal dim lookups)
but never writes ``df.join``; this module exposes the first-class forms.

Scale notes (100 TB):
  * ``broadcast_dim_join`` — dims up to the broadcast threshold ship to every
    executor; the fact side never shuffles. This is the real-join form of
    the reference's ``create_map`` lookup (02:145-147) for dims too big to
    constant-fold.
  * ``equi_join`` — sort-merge or shuffled-hash on the key; both sides
    shuffle unless pre-bucketed. AQE (on in our session factory) re-plans
    to broadcast at runtime when a side turns out small, and splits skewed
    partitions.
  * ``salted_join`` — explicit skew mitigation: the build side replicates
    SALT ways, the probe side scatters, so one hot key spreads across SALT
    reducers. Use when AQE skew-split isn't enough (e.g. one key = 30% of
    rows).
  * ``semi/anti`` — existence joins; Spark plans them without materializing
    the right side's payload columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    return left.join(right, on, how)


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Join a big fact table against a small dim without shuffling the fact."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter left across ``salt`` sub-keys and
    replicate right to match, so a single hot key fans out over ``salt``
    reducers instead of melting one.

    Keeps only the original columns; the salt columns are internal.

    Only left-preserving join types are allowed: the right side is
    replicated ``salt`` times, so for right/full/outer joins every unmatched
    right row would surface ``salt`` times null-extended — wrong results,
    not just wasted work.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "leftsemi"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    salted_left = left.withColumn(
        "__salt", (F.xxhash64(*left.columns) % salt + salt) % salt
    )
    exploded_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_left.join(exploded_right, [key, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | Sequence[str],
    buckets: int = 32,
) -> None:
    """Persist a table bucketed (and sorted) by the join key.

    Two tables bucketed identically on their join key co-locate: Spark plans
    the join with ZERO Exchange nodes — each task reads bucket i from both
    sides. At 100 TB this converts every recurring fact⋈fact join on the
    same key from a full two-sided shuffle into a scan-side merge; the
    shuffle is paid once at write time. (The same idea the reference gets
    implicitly from Delta + Z-ORDER clustering on join keys; Spark bucketing
    is the explicit, planner-visible form.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


def bucketed_join(
    spark_table_a: str,
    spark_table_b: str,
    on: str | Sequence[str],
    spark=None,
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed tables (see ``write_bucketed``). Verify with
    .explain: no Exchange above either scan when bucket specs match."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    return spark.table(spark_table_a).join(spark.table(spark_table_b), on, how)


# ---------------------------------------------------------------------------
# extensions beyond the reference (SURVEY §2.3 "noted as possible
# extensions"): as-of join and bounded range join — time-series staples the
# reference category (transaction feeds) wants but the notebooks never write.
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join: for every left row, the single most recent right
    row of the same ``key`` with ``right_time <= left_time`` (SQL-standard
    ASOF JOIN semantics; left rows with no earlier right row keep nulls).

    Spark-first plan — NOT a per-key loop and NOT an inequality join:
    union both sides, one window sort per key, carry the latest right row
    forward with ``last(..., ignorenulls)``. Exactly ONE shuffle (the window
    partitioning); at 100 TB that is the floor for any keyed time-align, and
    there is no candidate-pair blowup at all. Ties (equal timestamps) match
    — the right row sorts before the left row at the same instant.
    """
    rstruct = F.struct(*[F.col(c) for c in right.columns])
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[
            F.col(f"__m.{c}").alias(f"{right_prefix}{c}")
            for c in right.columns
        ],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` and
    ``left_time + lower <= right_time < left_time + upper``.

    A naive theta-join is O(n·m) per key; instead both sides bucket on
    ``floor(epoch / span)`` and the left side probes its own and adjacent
    buckets, so candidates come from an EQUI-join on (key, bucket) and the
    exact interval predicate only filters in-bucket pairs. Bucket span =
    interval width ⇒ each left row probes ≤2 buckets regardless of scale.
    """
    span = max(upper_seconds - lower_seconds, 1)
    # sub-second-exact epoch (cast to double keeps the fraction;
    # unix_timestamp would truncate to seconds and disagree with the
    # interval predicate at the boundaries)
    lepoch = F.col(left_time).cast("double")
    repoch = F.col(right_time).cast("double")
    lbkt = F.floor((lepoch + lower_seconds) / span)
    rbkt = F.floor(repoch / span)
    l = left.select(
        "*", F.explode(F.array(lbkt, lbkt + 1)).alias("__b")
    )
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        F.col(key).alias("__rk"),
        rbkt.alias("__b"),
    )
    rt = F.col(f"{right_prefix}{right_time}").cast("double")
    lt = lepoch
    return (
        l.join(r, (F.col(key) == F.col("__rk")) & (l["__b"] == r["__b"]))
        .filter((rt >= lt + lower_seconds) & (rt < lt + upper_seconds))
        .drop("__b", "__rk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    grid_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap join: pair rows whose [start, end) spans strictly
    overlap (``l.start < r.end AND r.start < l.end``) within the same
    ``on`` keys — the range×range shape Spark's equi-join machinery has
    no native plan for (a raw inequality join degenerates to a per-key
    nested loop).

    Scalable formulation: each interval explodes to the grid cells it
    covers (``ceil(len/grid)+1`` cells — choose ``grid_seconds`` near the
    typical interval length so the blow-up stays ~2×), the join runs as a
    pure equi-join on ``on + [cell]``, and instead of a distinct to drop
    multi-cell duplicates each surviving pair is kept ONLY in its anchor
    cell ``floor(max(starts)/grid)`` — both sides provably emit that cell
    for a true overlap, and exactly one cell matches, so no dedup shuffle
    exists in the plan. Non-key columns must be disjoint (pre-alias).
    """
    ls, le = left_span
    rs, re_ = right_span

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / grid_seconds),
                    F.floor(F.unix_timestamp(F.col(e)) / grid_seconds),
                )
            ),
        )

    overlap = (F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le))
    anchor = F.floor(
        F.greatest(F.unix_timestamp(ls), F.unix_timestamp(rs)) / grid_seconds
    )
    return (
        cells(left, ls, le)
        .join(cells(right, rs, re_), [*on, "__cell"])
        .filter(overlap & (F.col("__cell") == anchor))
        .drop("__cell")
    )
