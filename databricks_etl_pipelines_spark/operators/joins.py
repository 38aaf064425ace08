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
    """
    salted_left = left.withColumn(
        "__salt", (F.xxhash64(*left.columns) % salt + salt) % salt
    )
    exploded_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_left.join(exploded_right, [key, "__salt"], how)
    return joined.drop("__salt")
