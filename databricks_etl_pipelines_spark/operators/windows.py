"""Window-function operators (SURVEY §2.5).

The reference defines ``Window.partitionBy("cardholder_token")`` but never
invokes ``over()`` (03:91 — capability claimed, not exercised). These
helpers make the claim real: ranking, analytic lag/lead, framed rolling
aggregates, and deterministic top-n-per-group.

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort. Skewed partition keys (one user with 10⁹ events) serialize into one
task — pre-aggregate or bucket first. ``topn_per_group`` filters on
row_number so only n rows per key survive the window stage.

Determinism: any function sensitive to row order (row_number, lag, lead,
first/last, cumulative frames) must order by a total order — include a
unique tiebreak column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    partition_by: Sequence[str | Column], order_by: Sequence[Column | str]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def topn_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic top-n rows per key (order_by must be a total order)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    lag_name: str = "prev_value",
    lead_name: str = "next_value",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(lag_name, F.lag(col).over(w)).withColumn(
        lead_name, F.lead(col).over(w)
    )


def rolling_frame(
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    preceding: int,
    following: int = 0,
) -> WindowSpec:
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )


def cumulative_frame(
    partition_by: Sequence[str], order_by: Sequence[Column | str]
) -> WindowSpec:
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key time-series resampling onto a regular grid with forward fill
    — the gap-fill operator relational engines ship as RESAMPLE/ASOF and
    Spark composes from built-ins: bucket timestamps to the step, take the
    last observation per bucket (total order: ts then ``tiebreak_col``),
    explode ``sequence(min_bucket, max_bucket, step)`` into the dense grid,
    left-join observations, and carry the last non-null value forward with
    ``last(ignorenulls)`` over an unbounded-preceding frame.

    Output: ``key_col``, ``bucket_ts`` (grid point), ``n_events`` (0 on gap
    rows), ``value_ff`` (forward-filled last value; null until the key's
    first observation).

    Scale shape: one shuffle on (key, bucket) covers the dedup window AND
    the per-bucket aggregate; the grid explode is bounded by keys x
    horizon/step (grid rows, not event rows); the forward fill is one
    window per key over grid-sized data. No step ever re-shuffles raw
    events twice.

    ``step`` must be a UNIT interval ("1 hour", "1 day", "1 minute"):
    bucketing uses date_trunc on the unit, which cannot express "30
    minutes" grids — a non-unit step would silently misalign buckets
    against the sequence, so it is rejected here.
    """
    count, unit = step.split()
    unit = unit.rstrip("s")
    if count != "1" or unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(
            f"resample_forward_fill requires a unit step like '1 hour'; "
            f"got {step!r}"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    w_last = Window.partitionBy(key_col, "bucket_ts").orderBy(
        F.desc(ts_col), F.desc(tiebreak_col)
    )
    hourly = (
        df.withColumn("bucket_ts", bucket)
        .withColumn("__rn", F.row_number().over(w_last))
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias("__lastv"),
        )
    )
    grid = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"interval {step}"))
            ).alias("bucket_ts"),
        )
    )
    joined = grid.join(hourly, [key_col, "bucket_ts"], "left").select(
        key_col,
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "__lastv",
    )
    w_ff = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "value_ff", F.last("__lastv", ignorenulls=True).over(w_ff)
    ).drop("__lastv")
