"""SFT / instruction-data assembly: render per-entity event sequences into
training text with a chat-style template, and compute the EXACT character
spans where loss applies (the "mask everything except assistant turns"
step every fine-tuning pipeline runs before tokenization).

Relational decomposition — no string assembly is ever needed to know the
offsets:

  * each turn renders as ``role: payload\\n`` (pure Column concat);
  * a turn's END offset in the final rendered string is the running sum
    of rendered lengths over the (ts, id) window — one prefix-sum window,
    the same single-exchange shape as sessionization;
  * START = END − length(turn). Loss spans are then just the rows whose
    role is in the loss set.

The rendered document itself is an ordered aggregation (collect sorted
structs → join), needed only by the writer — offsets come from the window
alone, so a 100 TB corpus computes masks without materializing any
concatenated text in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _turn_text(role_col: str, payload_col: str) -> Column:
    return F.concat(F.col(role_col), F.lit(": "), F.col(payload_col), F.lit("\n"))


def turn_offsets(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    role_col: str,
    payload_col: str,
    loss_roles: tuple[str, ...],
) -> DataFrame:
    """Per turn: 0-based index, [start_char, end_char) offsets into the
    rendered conversation, and whether the turn is loss-bearing."""
    turn = _turn_text(role_col, payload_col)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cum = Window.partitionBy(key_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    end = F.sum(F.length(turn).cast("bigint")).over(cum)
    return df.select(
        F.col(key_col),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col(role_col).alias("role"),
        (end - F.length(turn)).alias("start_char"),
        end.alias("end_char"),
        F.col(role_col).isin(*loss_roles).cast("int").alias("in_loss"),
    )


def rendered_conversations(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    role_col: str,
    payload_col: str,
    loss_roles: tuple[str, ...],
) -> DataFrame:
    """Per conversation: turn count, total rendered chars, loss-covered
    chars, and the md5 of the fully rendered text (order-pinned via
    sorted-struct reassembly — the writer-side materialization)."""
    turn = _turn_text(role_col, payload_col)
    packed = df.select(
        F.col(key_col),
        F.struct(*[F.col(c) for c in order_cols], turn.alias("t")).alias("s"),
        F.length(turn).cast("bigint").alias("turn_len"),
        F.when(F.col(role_col).isin(*loss_roles), F.length(turn))
        .otherwise(0)
        .cast("bigint")
        .alias("loss_len"),
    )
    rendered = F.array_join(
        F.transform(F.array_sort(F.collect_list("s")), lambda s: s["t"]), ""
    )
    return packed.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("turn_len").alias("total_chars"),
        F.sum("loss_len").alias("loss_chars"),
        F.md5(rendered).alias("rendered_md5"),
    )


_MARGIN_DEFAULT_WARNED = False


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    min_margin: int | None = None,
) -> DataFrame:
    """DPO/RLHF preference-pair assembly: per prompt group, pair the
    best-scored candidate (chosen) against the worst (rejected), dropping
    groups with fewer than two candidates or a score margin below
    ``min_margin``.

    The default margin is 1, not 0: a tied-score group yields a pair with
    zero preference signal (chosen and rejected are interchangeable),
    which silently dilutes a DPO dataset. Pass ``min_margin=0`` to opt
    into emitting tied pairs explicitly. The default changed from 0 in
    round 5; relying on it logs a one-time warning per process so callers
    migrating from the old behavior get a signal instead of a silently
    smaller dataset (counting the dropped groups would force an extra
    action on a lazy plan, so the warning is unconditional).

    Single hash aggregate — best/worst are lexicographic max/min over a
    ``(score, -id)`` struct, so ties break deterministically (chosen →
    smallest id, rejected → largest id) and the whole pairing runs with
    map-side partial aggregation: no window sort, no self-join, one
    shuffle of one struct per group regardless of candidates per prompt.
    """
    if min_margin is None:
        min_margin = 1
        global _MARGIN_DEFAULT_WARNED
        if not _MARGIN_DEFAULT_WARNED:
            _MARGIN_DEFAULT_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "preference_pairs: default min_margin is 1 (was 0 before "
                "round 5) — tied-score groups are dropped; pass "
                "min_margin=0 to emit tied pairs"
            )
    key = F.struct(
        F.col(score_col).alias("s"),
        (-F.col(id_col)).alias("ni"),
        F.col(id_col).alias("i"),
    )
    g = df.groupBy(group_col).agg(
        F.max(key).alias("__b"),
        F.min(key).alias("__w"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return g.select(
        group_col,
        F.col("__b.i").alias("chosen_id"),
        F.col("__b.s").alias("chosen_score"),
        F.col("__w.i").alias("rejected_id"),
        F.col("__w.s").alias("rejected_score"),
        "n_candidates",
    ).filter(
        (F.col("chosen_id") != F.col("rejected_id"))
        & (F.col("chosen_score") - F.col("rejected_score") >= min_margin)
    )
