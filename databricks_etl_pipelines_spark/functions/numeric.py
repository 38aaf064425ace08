"""Cross-engine-stable numeric helpers.

``F.round`` on doubles goes through Java BigDecimal (exact decimal of the
double, HALF_UP) while DuckDB rounds via float math — at .xx5 boundaries
they disagree. ``stable_round`` instead uses ``floor(x·10ⁿ + 0.5)/10ⁿ``,
which is pure IEEE ops both engines execute identically, so differential
tests are bit-stable. Semantics: round-half-toward-+∞ (fine for the
non-negative money/ratio domains used here).

The matching oracle-SQL form is ``floor(x * POW + 0.5) / POW``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, scale: int = 2) -> Column:
    pow10 = 10**scale
    return F.floor(col * pow10 + F.lit(0.5)) / pow10


def sql_stable_round(expr: str, scale: int = 2) -> str:
    pow10 = 10**scale
    return f"floor(({expr}) * {pow10} + 0.5) / {pow10}"
