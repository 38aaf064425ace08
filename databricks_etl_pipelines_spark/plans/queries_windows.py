"""Window-function queries (SURVEY §2.5) over events and customer.

Each compares against standard SQL window functions in DuckDB. Row-order-
sensitive functions always order by a total order (ts + event_id tiebreak)
so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.functions.numeric import stable_round
from databricks_etl_pipelines_spark.operators.windows import (
    cumulative_frame,
    rolling_frame,
    topn_per_group,
    with_lag_lead,
)
from databricks_etl_pipelines_spark.sources import table

# -- row_number top-n per group ------------------------------------------------

_TOPN_ORACLE = """
SELECT user_id, event_id, event_type, "value", rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id
  ) AS rn
  FROM events
)
WHERE rn <= 3
"""


@query("window_topn_per_user", _TOPN_ORACLE)
def window_topn_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    top = topn_per_group(
        ev, ["user_id"], [F.desc("ts"), F.col("event_id")], 3, rank_col="rn"
    )
    return top.select(
        "user_id", "event_id", "event_type", "value",
        F.col("rn").cast("bigint").alias("rn"),
    )


# -- rank / dense_rank with real ties -------------------------------------------

_RANK_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
  rank() OVER (
    PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000) DESC
  ) AS bal_rank,
  dense_rank() OVER (
    PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000) DESC
  ) AS bal_dense_rank
FROM customer
"""


@query("window_rank_dense_rank", _RANK_ORACLE)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc(F.floor(F.col("c_acctbal") / 1000))
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_k"),
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
    )


# -- lag / lead analytic ----------------------------------------------------------

_LAG_ORACLE = """
SELECT
  user_id, event_id, "value",
  lag("value") OVER w AS prev_value,
  lead("value") OVER w AS next_value,
  "value" - lag("value") OVER w AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("window_lag_lead", _LAG_ORACLE)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    with_ll = with_lag_lead(
        ev, "value", ["user_id"], [F.col("ts"), F.col("event_id")]
    )
    return with_ll.select(
        "user_id",
        "event_id",
        "value",
        "prev_value",
        "next_value",
        (F.col("value") - F.col("prev_value")).alias("value_delta"),
    )


# -- rolling frame aggregate (rowsBetween -2..0) -----------------------------------

_ROLLING_ORACLE = """
SELECT
  user_id, event_id,
  floor(sum("value") OVER w * 100 + 0.5) / 100 AS rolling_sum3,
  count(*) OVER w AS rolling_n,
  floor((floor(sum("value") OVER w * 100 + 0.5) / 100) / count(*) OVER w
        * 10000 + 0.5) / 10000 AS rolling_avg3
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
"""


@query("window_rolling_avg", _ROLLING_ORACLE)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = rolling_frame(["user_id"], [F.col("ts"), F.col("event_id")], 2, 0)
    rolling_sum = stable_round(F.sum("value").over(w), 2)
    rolling_n = F.count("*").over(w)
    return ev.select(
        "user_id",
        "event_id",
        rolling_sum.alias("rolling_sum3"),
        rolling_n.alias("rolling_n"),
        stable_round(rolling_sum / rolling_n, 4).alias("rolling_avg3"),
    )


# -- cumulative sum -----------------------------------------------------------------

_CUMSUM_ORACLE = """
SELECT
  user_id, event_id,
  floor(sum("value") OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) * 100 + 0.5) / 100 AS running_total
FROM events
"""


@query("window_cumulative_sum", _CUMSUM_ORACLE)
def window_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = cumulative_frame(["user_id"], [F.col("ts"), F.col("event_id")])
    return ev.select(
        "user_id",
        "event_id",
        stable_round(F.sum("value").over(w), 2).alias("running_total"),
    )


# -- first/last value over full partition frame ---------------------------------------

_FIRSTLAST_ORACLE = """
SELECT DISTINCT
  user_id,
  first_value(event_type) OVER w AS first_event_type,
  last_value(event_type) OVER w AS last_event_type,
  count(*) OVER (PARTITION BY user_id) AS user_events
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@query("window_first_last", _FIRSTLAST_ORACLE)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event_type"),
        F.last("event_type").over(w).alias("last_event_type"),
        F.count("*").over(Window.partitionBy("user_id")).alias("user_events"),
    ).distinct()


# -- distribution rank functions: ntile / percent_rank / cume_dist -------------

_NTILE_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  ntile(4) OVER w AS price_quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@query("window_ntile_percent_rank", _NTILE_ORACLE)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        stable_round(F.cume_dist().over(w), 6).alias("cume"),
    )


# -- batch sessionization: lag-gap flag + running sum --------------------------

_SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id,
    CAST(sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
  CAST(count(*) AS BIGINT) AS n_events,
  min(ts) AS session_start,
  max(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


@query("window_sessionize_events", _SESSIONIZE_ORACLE)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the lag-gap + running-sum composition): one
    window shuffle on user_id covers both window passes AND pre-partitions
    the final groupBy — Catalyst reuses the partitioning, so the whole
    query is a single exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Integer µs subtraction — `cast(ts as double)` both loses ~1e-7 s at
    # epoch magnitude and is an invalid cast on TIMESTAMP_NTZ inputs.
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # Explicit casts pin the session bounds to plain TIMESTAMP so the
    # harness's pandas canonicalization can't see ns-vs-µs dtype drift
    # between the Spark and DuckDB sides.
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").cast("timestamp").alias("session_start"),
        F.max("ts").cast("timestamp").alias("session_end"),
    )


# -- product analytics: ordered funnel + weekly cohort retention --------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
    OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
    OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
    OVER (PARTITION BY user_id) AS t3
  FROM s2
)
SELECT
  CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT)
    AS users_view,
  CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT)
    AS users_view_click,
  CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT)
    AS users_funnel_complete
FROM s3
"""


@query("window_funnel_ordered", _FUNNEL_ORACLE)
def window_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage's
    timestamp is the user's earliest qualifying event STRICTLY AFTER the
    previous stage (the product-analytics funnel, not mere set
    membership).

    Scale shape: three same-partitioning window passes — Catalyst plans
    ONE user_id exchange and reuses it; the final stage counts are a
    global rollup of per-user flags."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.agg(
        F.countDistinct(
            F.when(F.col("t1").isNotNull(), F.col("user_id"))
        ).alias("users_view"),
        F.countDistinct(
            F.when(F.col("t2").isNotNull(), F.col("user_id"))
        ).alias("users_view_click"),
        F.countDistinct(
            F.when(F.col("t3").isNotNull(), F.col("user_id"))
        ).alias("users_funnel_complete"),
    )


_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_date
  FROM events GROUP BY user_id
)
SELECT
  CAST(date_trunc('week', f.first_date) AS TIMESTAMP) AS cohort_week,
  CAST(floor((CAST(e.ts AS DATE) - f.first_date) / 7.0) AS INT)
    AS week_offset,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


@query("window_cohort_retention", _RETENTION_ORACLE)
def window_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week they first
    appeared; n_users = how many of each cohort were active k weeks later
    (offset measured from each user's own first day, so engine week
    conventions cancel out).

    Scale shape: one user_id aggregate for first-seen dates, an equi-join
    back (AQE broadcasts the per-user relation when small), one
    (cohort, offset) aggregate — all partial-aggregated."""
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_date")
    )
    return (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .join(first, "user_id")
        .select(
            # timestamp, not date: DateType reaches pandas as object cells,
            # which the driver's canonicalizer may hash differently than
            # DuckDB's datetime64 — same convention as scalar_datetime
            F.date_trunc("week", "first_date").alias("cohort_week"),
            F.floor(F.datediff("d", "first_date") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_TRANSITIONS_ORACLE = """
WITH o AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
  CAST(count(*) AS BIGINT) AS n_transitions
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@query("window_event_transitions", _TRANSITIONS_ORACLE)
def window_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts (the Markov matrix of user
    journeys): lag over each user's total-ordered event stream, then one
    (prev, next) aggregate. One user_id window exchange + one partial-
    aggregated rollup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


# -- time-series resample + forward fill --------------------------------------

_RESAMPLE_ORACLE = """
WITH ev AS (
  SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, "value",
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
),
hourly AS (
  SELECT user_id, h,
         CAST(count(*) AS BIGINT) AS n_events,
         max(CASE WHEN rn = 1 THEN "value" END) AS lastv
  FROM ev GROUP BY user_id, h
),
bounds AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
joined AS (
  SELECT g.user_id, g.h,
         coalesce(hh.n_events, 0) AS n_events, hh.lastv
  FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
)
SELECT user_id, h AS bucket_ts, n_events,
       last_value(lastv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ff
FROM joined
"""


@query("window_resample_forward_fill", _RESAMPLE_ORACLE)
def window_resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample of the events feed with forward fill
    (operators/windows.py:resample_forward_fill): dense grid rows for gap
    hours with n_events=0 and the last observed value carried forward —
    the feature-engineering shape behind "state of every entity at every
    tick" training tables."""
    from databricks_etl_pipelines_spark.operators.windows import (
        resample_forward_fill,
    )

    ev = table(spark, sf_dir, "events")
    return resample_forward_fill(
        ev, "user_id", "ts", "value", "event_id", step="1 hour"
    )


# -- rolling z-score anomaly detection ---------------------------------------
# The ops-monitoring shape: each event scored against ITS OWN trailing
# baseline (10 preceding rows, current row excluded so the anomaly can't
# contaminate its baseline). The |z| threshold compares the ROUNDED score
# on both engines, so the cut is engine-stable.

_ANOMALY_ORACLE = """
WITH stats AS (
  SELECT user_id, event_id, "value",
    count(*) OVER w AS n_prev,
    avg("value") OVER w AS mu,
    stddev_samp("value") OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id,
  floor("value" * 100 + 0.5) / 100 AS value,
  floor(mu * 10000 + 0.5) / 10000 AS baseline_mean,
  floor(("value" - mu) / sd * 10000 + 0.5) / 10000 AS zscore
FROM stats
WHERE n_prev >= 5 AND sd > 0.000001
  AND abs(floor(("value" - mu) / sd * 10000 + 0.5) / 10000) > 2.5
"""


@query("window_anomaly_zscore", _ANOMALY_ORACLE)
def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-baseline anomaly detection: flag events whose value sits
    more than 2.5 sample standard deviations from the mean of the user's
    previous ≤10 events (≥5 required; the current row is EXCLUDED from
    its own baseline). One window exchange on user_id; the z cut uses
    the stable-rounded score so both engines agree at the boundary."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-10, -1)
    )
    n_prev = F.count("*").over(w)
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    # nullif: a CONSTANT trailing window has sd exactly 0.0, and the z
    # projection evaluates before the __sd filter can exclude the row —
    # under ANSI mode the bare division would raise. NULL z is filtered
    # by the |z| cut, matching DuckDB (0-divide yields NULL there).
    z = stable_round((F.col("value") - mu) / F.nullif(sd, F.lit(0.0)), 4)
    return (
        ev.select(
            "user_id",
            "event_id",
            stable_round(F.col("value"), 2).alias("value"),
            stable_round(mu, 4).alias("baseline_mean"),
            z.alias("zscore"),
            n_prev.alias("__n"),
            sd.alias("__sd"),
        )
        .where(
            (F.col("__n") >= 5)
            & (F.col("__sd") > 0.000001)
            & (F.abs(F.col("zscore")) > 2.5)
        )
        .drop("__n", "__sd")
    )


# -- SFT assembly: template rendering + loss-mask char offsets ---------------
# Events stand in for conversation turns (role = event_type, payload =
# props); 'click'/'purchase' are the loss-bearing "assistant" roles.

_SFT_ROLES = "('click', 'purchase')"

_SFT_OFFSETS_ORACLE = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
    event_type || ': ' || props || chr(10) AS turn
  FROM events
)
SELECT user_id,
  CAST(row_number() OVER (
    PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  event_type AS role,
  CAST(sum(length(turn)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) - length(turn) AS BIGINT) AS start_char,
  CAST(sum(length(turn)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_char,
  CASE WHEN event_type IN {_SFT_ROLES} THEN 1 ELSE 0 END AS in_loss
FROM t
"""


@query("sft_turn_offsets", _SFT_OFFSETS_ORACLE)
def sft_turn_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask computation for instruction tuning: each turn's EXACT
    [start, end) character span inside its rendered conversation, from
    one prefix-sum window — no string is ever concatenated to know the
    offsets (operators/sft.py)."""
    from databricks_etl_pipelines_spark.operators.sft import turn_offsets

    ev = table(spark, sf_dir, "events")
    return turn_offsets(
        ev, "user_id", ["ts", "event_id"], "event_type", "props",
        ("click", "purchase"),
    )


_SFT_RENDERED_ORACLE = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
    event_type || ': ' || props || chr(10) AS turn
  FROM events
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(length(turn)) AS BIGINT) AS total_chars,
  CAST(sum(CASE WHEN event_type IN {_SFT_ROLES}
               THEN length(turn) ELSE 0 END) AS BIGINT) AS loss_chars,
  md5(string_agg(turn, '' ORDER BY ts, event_id)) AS rendered_md5
FROM t GROUP BY user_id
"""


@query("sft_rendered_conversations", _SFT_RENDERED_ORACLE)
def sft_rendered_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-side conversation materialization: ordered template render
    (md5-compared cross-engine so the byte-exact text is pinned) plus
    turn/char/loss-char accounting per conversation."""
    from databricks_etl_pipelines_spark.operators.sft import (
        rendered_conversations,
    )

    ev = table(spark, sf_dir, "events")
    return rendered_conversations(
        ev, "user_id", ["ts", "event_id"], "event_type", "props",
        ("click", "purchase"),
    )


# -- per-key exponential moving average (ordered fold, dyadic alphas) ---------

# EMA is a sequential recurrence (s_i = α·x_i + (1−α)·s_{i−1}) — not a
# commutative aggregate — so it is computed as a PINNED-ORDER fold over
# each key's time-ordered series, the replayable-without-a-lattice case
# from the trap notes (visit order is explicit, not shuffle-dependent).
# Alphas are dyadic (1/2, 1/4): every step is mul/add/exact-halving —
# deterministic identical IEEE on both engines. DuckDB's list_reduce
# seeds with the first element, so Spark seeds aggregate() with x₁ and
# folds the tail — the standard s₀ = x₀ initialization on both sides.
_EMA_ORACLE = """
WITH s AS (
  SELECT user_id, list("value" ORDER BY ts, event_id) AS xs,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
  floor(xs[len(xs)] * 1000000 + 0.5) / 1000000 AS last_value,
  floor(list_reduce(xs, (acc, x) -> (acc + x) / CAST(2 AS DOUBLE))
        * 1000000 + 0.5) / 1000000 AS ema_half,
  floor(list_reduce(xs, (acc, x) ->
          (acc * CAST(3 AS DOUBLE) + x) / CAST(4 AS DOUBLE))
        * 1000000 + 0.5) / 1000000 AS ema_quarter
FROM s
"""


@query("window_ema_smoothing", _EMA_ORACLE)
def window_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values at two dyadic
    smoothing factors (α = 1/2 and 1/4) — the streaming-metrics
    smoother (latency/spend EMAs) the frame-based rolling_avg family
    cannot express, because EMA weights decay multiplicatively over the
    WHOLE history rather than cutting off at a frame boundary.

    Semantics: series ordered by (ts, event_id) — a total order, so the
    fold order is engine-independent; s₀ = x₀; α dyadic so every step
    is one multiply, one add, one exact power-of-two division —
    bit-identical IEEE on both engines with no rounding lattice needed
    (only cross-row SUMS with unknown visit order need lattices; this
    fold's visit order is pinned).

    Scale shape: one shuffle on user_id; each key's series is collected
    and folded WITHIN its group (collect_list bounded by per-user
    activity — the same per-key bound as sessionize/funnel; a key with
    millions of events would need a chunked scan-EMA, not this). No
    partitionless window anywhere."""
    ev = table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    g = ev.groupBy("user_id").agg(
        arr.alias("rs"), F.count("*").alias("n_events")
    )
    xs = F.transform("rs", lambda r: r["value"])
    tail = F.slice(xs, F.lit(2), F.size(xs) - 1)
    ema_h = F.aggregate(
        tail,
        F.element_at(xs, 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    ema_q = F.aggregate(
        tail,
        F.element_at(xs, 1),
        lambda acc, x: (acc * F.lit(3.0) + x) / F.lit(4.0),
    )
    return g.select(
        "user_id",
        "n_events",
        stable_round(F.element_at(xs, -1), 6).alias("last_value"),
        stable_round(ema_h, 6).alias("ema_half"),
        stable_round(ema_q, 6).alias("ema_quarter"),
    )


# -- per-key Holt linear (double-exponential) smoothing ------------------------

# Level+trend extension of the EMA fold: Holt's recurrence
#   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
#   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
# at dyadic α = 1/2, β = 1/4, with the classical two-point init:
# l = x₂, b = x₂ − x₁, folding from x₃
# (n = 1 degenerates to level = x₁, trend = 0). The PAIR state rides
# through DuckDB's seed-with-first-element list_reduce by encoding
# (l, b) as a 2-element LIST seed prepended to [x, 0]-encoded tail
# elements (list_reduce has no initial-accumulator arg in DuckDB 1.0,
# and its recursive-CTE nested-LIST corruption trap does NOT apply to
# list lambdas — verified empirically). l_t appears twice inside the
# b_t step; BOTH engines compute it as the same duplicated
# subexpression on identical inputs, so every step stays mul / add /
# exact-halving — bit-identical IEEE, no lattice (pinned fold order,
# the window_ema_smoothing discipline). Scale: one user_id shuffle,
# per-key bounded collect (sessionize/funnel contract).
_HOLT_ORACLE = """
WITH s AS (
  SELECT user_id, list("value" ORDER BY ts, event_id) AS xs,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
h AS (
  SELECT user_id, n_events,
    CASE WHEN n_events = 1 THEN [xs[1], CAST(0 AS DOUBLE)]
    ELSE list_reduce(
      list_prepend([xs[2], xs[2] - xs[1]],
        list_transform(xs[3:len(xs)], x -> [x, CAST(0 AS DOUBLE)])),
      (acc, x) -> [
        (x[1] + acc[1] + acc[2]) / CAST(2 AS DOUBLE),
        ((x[1] + acc[1] + acc[2]) / CAST(2 AS DOUBLE) - acc[1]
         + CAST(3 AS DOUBLE) * acc[2]) / CAST(4 AS DOUBLE) ]
    ) END AS st
  FROM s
)
SELECT user_id, n_events,
  floor(st[1] * 1000000 + 0.5) / 1000000 AS level,
  floor(st[2] * 1000000 + 0.5) / 1000000 AS trend,
  floor((st[1] + st[2]) * 1000000 + 0.5) / 1000000 AS forecast_1
FROM h
"""


@query("window_holt_linear", _HOLT_ORACLE)
def window_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear (double-exponential) smoothing of event
    values — level AND trend state, so a steadily climbing spend
    series forecasts UP where the plain EMA lags it; the one-step
    forecast level+trend is the anomaly baseline for trending metrics.
    Dyadic α = 1/2, β = 1/4; two-point init (l = x₂, b = x₂ − x₁);
    see the oracle comment for the pair-state fold and the
    bit-identical-IEEE argument."""
    ev = table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    g = ev.groupBy("user_id").agg(
        arr.alias("rs"), F.count("*").alias("n_events")
    )
    xs = F.transform("rs", lambda r: r["value"])
    x1 = F.element_at(xs, 1)
    x2 = F.element_at(xs, 2)
    tail3 = F.slice(
        xs, F.lit(3), F.greatest(F.size(xs) - 2, F.lit(0))
    )

    def step(acc, x):
        lnew = (x + acc["l"] + acc["b"]) / F.lit(2.0)
        bnew = (
            (x + acc["l"] + acc["b"]) / F.lit(2.0)
            - acc["l"]
            + F.lit(3.0) * acc["b"]
        ) / F.lit(4.0)
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    folded = F.aggregate(
        tail3,
        F.struct(x2.alias("l"), (x2 - x1).alias("b")),
        step,
    )
    st = F.when(
        F.col("n_events") == 1,
        F.struct(x1.alias("l"), F.lit(0.0).alias("b")),
    ).otherwise(folded)
    return g.select(
        "user_id",
        "n_events",
        stable_round(st["l"], 6).alias("level"),
        stable_round(st["b"], 6).alias("trend"),
        stable_round(st["l"] + st["b"], 6).alias("forecast_1"),
    )


# -- per-key additive Holt-Winters (level + trend + hour-of-day season) --------

# The third smoothing member (EMA → Holt linear → Holt-Winters): the
# additive triple recurrence at dyadic α = 1/2, β = 1/4, γ = 1/2 with a
# FIXED period m = 24 keyed by each observation's HOUR OF DAY (event
# series are irregular, so position-mod-24 slots would be meaningless;
# hour-keying is the deseasonalization a diurnal metric needs):
#
#   l_t      = α(x_t − s[h_t]) + (1−α)(l_{t−1} + b_{t−1})
#   b_t      = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
#   s[h_t]   = γ(x_t − l_t) + (1−γ)·s[h_t]        (other slots unchanged)
#
# Init l = x₁, b = 0, s[·] = 0 — the UNIFORM-recurrence init (no
# first-season mean), so n = 1 and n ≤ period need no special casing:
# with γ = 1/2 a slot's residual init bias after k observations is 2^−k.
# The (2+m)-element state vector [l, b, s₀..s₂₃] rides the same
# seed-with-first list_reduce transport the Holt pair state proved:
# seed = [x₁, 0, 0×24], tail elements are [x_t, hour_t] 2-lists (DuckDB
# list elements may differ in length; hour as an exact-integer DOUBLE).
# l_t appears inside both the b_t and s-slot steps; BOTH engines compute
# it as the same duplicated inline subexpression on identical inputs, so
# every step stays mul / add / exact-halving — bit-identical IEEE, no
# lattice (pinned fold order). The untouched 23 slots are COPIED, not
# recomputed (Spark rebuilds via an indexed transform, DuckDB via
# 1-based slicing — copies are exact, so the construction paths agree
# bit-for-bit). Scale: one user_id shuffle, per-key bounded collect
# (the sessionize/funnel contract); per-key state is 26 doubles.
_HW_PERIOD = 24

# DuckDB lambda shorthand: li/bi = acc[1]/acc[2]; sh = acc[3 + slot].
# lnew/snew are inlined with the exact expression shape the Spark side
# uses (see step() below).
_HW_LNEW = (
    "(e[1] - acc[3 + CAST(e[2] AS BIGINT)] + acc[1] + acc[2])"
    " / CAST(2 AS DOUBLE)"
)

_HOLT_WINTERS_ORACLE = f"""
WITH s AS (
  SELECT user_id,
    list("value" ORDER BY ts, event_id) AS xs,
    list(CAST(hour(ts) AS DOUBLE) ORDER BY ts, event_id) AS hs,
    CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
h AS (
  SELECT user_id, n_events,
    list_reduce(
      list_prepend(
        list_concat([xs[1], CAST(0 AS DOUBLE)],
          list_transform(generate_series(1, {_HW_PERIOD}),
                         j -> CAST(0 AS DOUBLE))),
        list_transform(generate_series(2, len(xs)),
                       i -> [xs[i], hs[i]])
      ),
      (acc, e) -> list_concat(list_concat(list_concat(
        [ {_HW_LNEW},
          ({_HW_LNEW} - acc[1] + CAST(3 AS DOUBLE) * acc[2])
            / CAST(4 AS DOUBLE) ],
        acc[3 : 2 + CAST(e[2] AS BIGINT)]),
        [ (e[1] - {_HW_LNEW} + acc[3 + CAST(e[2] AS BIGINT)])
            / CAST(2 AS DOUBLE) ]),
        acc[4 + CAST(e[2] AS BIGINT) : {_HW_PERIOD + 2}])
    ) AS st
  FROM s
)
SELECT user_id, n_events,
  floor(st[1] * 1000000 + 0.5) / 1000000 AS level,
  floor(st[2] * 1000000 + 0.5) / 1000000 AS trend,
  floor(list_aggregate(st[3 : {_HW_PERIOD + 2}], 'min') * 1000000 + 0.5)
    / 1000000 AS seasonal_min,
  floor(list_aggregate(st[3 : {_HW_PERIOD + 2}], 'max') * 1000000 + 0.5)
    / 1000000 AS seasonal_max
FROM h
"""


@query("window_holt_winters", _HOLT_WINTERS_ORACLE)
def window_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user additive Holt-Winters smoothing of event values —
    level, trend AND a 24-slot hour-of-day seasonal profile, so a
    diurnal metric (nightly dips, lunchtime spikes) deseasonalizes
    before its trend is read; the seasonal min/max summarize the
    learned daily amplitude. Dyadic α = 1/2, β = 1/4, γ = 1/2; uniform
    init (l = x₁, b = 0, s = 0 — n ≤ period degenerates gracefully);
    see the oracle comment for the 26-element state-vector fold and
    the bit-identical-IEEE argument."""
    ev = table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    g = ev.groupBy("user_id").agg(
        arr.alias("rs"), F.count("*").alias("n_events")
    )
    x1 = F.element_at(F.col("rs"), 1)["value"]
    tail = F.transform(
        F.slice(
            F.col("rs"), F.lit(2),
            F.greatest(F.size("rs") - 1, F.lit(0)),
        ),
        lambda r: F.array(
            r["value"], F.hour(r["ts"]).cast("double")
        ),
    )
    seed = F.concat(
        F.array(x1, F.lit(0.0)),
        F.array_repeat(F.lit(0.0), _HW_PERIOD),
    )

    def step(acc, e):
        x = F.element_at(e, 1)
        hi = F.element_at(e, 2).cast("int")
        l = F.element_at(acc, 1)
        b = F.element_at(acc, 2)
        sh = F.element_at(acc, hi + F.lit(3))
        # lnew is inlined (recomputed) inside bnew/snew with the SAME
        # expression shape as the oracle's {_HW_LNEW} — duplicated
        # subexpressions of identical inputs are bit-identical
        lnew = (x - sh + l + b) / F.lit(2.0)
        bnew = (
            (x - sh + l + b) / F.lit(2.0) - l + F.lit(3.0) * b
        ) / F.lit(4.0)
        snew = (
            x - (x - sh + l + b) / F.lit(2.0) + sh
        ) / F.lit(2.0)
        slots = F.transform(
            F.slice(acc, 3, _HW_PERIOD),
            lambda sv, j: F.when(j == hi, snew).otherwise(sv),
        )
        return F.concat(F.array(lnew, bnew), slots)

    st = F.aggregate(tail, seed, step)
    season = F.slice(st, 3, _HW_PERIOD)
    return g.select(
        "user_id",
        "n_events",
        stable_round(F.element_at(st, 1), 6).alias("level"),
        stable_round(F.element_at(st, 2), 6).alias("trend"),
        stable_round(F.array_min(season), 6).alias("seasonal_min"),
        stable_round(F.array_max(season), 6).alias("seasonal_max"),
    )
