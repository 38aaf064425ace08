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
