"""Enrichment expression builders: bucketing, dim lookups, rule scoring.

Re-expresses the reference's silver-layer enrichment idioms (SURVEY §2.2
P9-P11, §2.3 J2-J3) as reusable Column builders:

  * ``bucketize`` — N-arm ``when/otherwise`` threshold bucketing
    (02_Silver_Cleanse_PII.py:150-154's amount_bucket).
  * ``map_lookup`` — small-dim lookup folded into a ``create_map`` literal
    (02:145-147). For dims up to ~hundreds of entries this beats any join:
    the map constant-folds into codegen, zero shuffle, zero broadcast. For
    bigger dims use ``operators.joins.broadcast_dim_join``.
  * ``array_pick`` — 1-based positional pick from a literal pool
    (01_Bronze_FinServ_Streaming.py:101-133's categorical sampling).
  * ``additive_score`` — weighted sum of boolean conditions
    (02:159-164's risk_score_raw).
  * ``any_flag`` — boolean-OR labeling to 0/1 (03:140-146's is_suspicious).

All pure expressions: codegen-able, scale-free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bucketize(
    col: Column | str,
    thresholds: Sequence[float],
    labels: Sequence[str],
) -> Column:
    """labels[i] where col < thresholds[i], else labels[-1].

    Requires ``len(labels) == len(thresholds) + 1``.
    """
    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    col = _c(col)
    expr = F.when(col < thresholds[0], labels[0])
    for t, label in zip(thresholds[1:], labels[1:-1]):
        expr = expr.when(col < t, label)
    return expr.otherwise(labels[-1])


def map_lookup(
    key: Column | str,
    mapping: Mapping[str, str],
    default: str | None = None,
) -> Column:
    """Literal-map dim lookup; constant-folds, no join, no shuffle."""
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked_up = F.create_map(*pairs)[_c(key)]
    return looked_up if default is None else F.coalesce(looked_up, F.lit(default))


def array_pick(values: Sequence[str], index: Column | str) -> Column:
    """1-based positional pick from a literal pool: ``pool[idx % n + 1]``."""
    idx = _c(index)
    return F.element_at(
        F.array(*[F.lit(v) for v in values]),
        (idx % len(values) + 1).cast("int"),
    )


def additive_score(terms: Sequence[tuple[Column, int]]) -> Column:
    """Σ weight·[condition] — weighted rule score as one codegen expression."""
    score: Column | None = None
    for cond, weight in terms:
        term = F.when(cond, weight).otherwise(0)
        score = term if score is None else score + term
    if score is None:
        raise ValueError("need at least one term")
    return score


def any_flag(*conditions: Column) -> Column:
    """1 if any condition holds else 0 (boolean-OR labeling)."""
    combined = conditions[0]
    for cond in conditions[1:]:
        combined = combined | cond
    return F.when(combined, 1).otherwise(0)
