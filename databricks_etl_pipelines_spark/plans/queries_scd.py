"""SCD Type 2 dimension queries (operators/scd.py) — batch derivation,
order-insensitive incremental maintenance, and the streaming flavor.

The reference keeps dims current-state-only via MERGE (reference
``02_Silver_Cleanse_PII.py:174-184``); these queries add the historical
form. All three share one relational core, so DuckDB replays the exact
window algebra: change-point → running version → run aggregate → interval
stitch. The incremental and streaming variants are folded through
ManagedTable logs in deliberately non-chronological batches, and must
still hash-match the one-shot SQL over the full feed — that equality IS
the order-insensitivity proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.operators.scd import (
    scd2_apply,
    scd2_history,
    scd2_stream_apply,
)
from databricks_etl_pipelines_spark.sources import table
from databricks_etl_pipelines_spark.sources.managed_table import ManagedTable
from databricks_etl_pipelines_spark.sources.scratch import scratch_dir

# Open-ended intervals use a sentinel end instead of NULL in compared
# output: the warehouse-conventional high date (capped to 2200 — the
# harness compares through pandas, whose ns timestamps overflow at 2262),
# and NULL timestamps would compare NaT != NaT on both sides anyway.
OPEN_END = "2200-01-01 00:00:00"


def _close_open_end(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "effective_to",
        F.coalesce(
            F.col("effective_to"), F.lit(OPEN_END).cast("timestamp")
        ),
    )


def _scd2_oracle(
    src: str,
    key: str,
    attrs: list[str],
    ts: str,
    tiebreak: str,
    with_counts: bool,
) -> str:
    """DuckDB replay of scd2_history over table ``src``."""
    same = " AND ".join(
        f"{a} IS NOT DISTINCT FROM lag({a}) OVER w" for a in attrs
    )
    attr_mins = ",\n         ".join(f"min({a}) AS {a}" for a in attrs)
    n_obs_sel = (
        ",\n         CAST(count(*) AS BIGINT) AS n_obs" if with_counts else ""
    )
    n_obs_out = ", n_obs" if with_counts else ""
    return f"""
WITH obs AS (
  SELECT {key}, {", ".join(attrs)}, {ts}, {tiebreak},
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN {same} THEN 0 ELSE 1 END AS chg
  FROM {src}
  WINDOW w AS (PARTITION BY {key} ORDER BY {ts}, {tiebreak})
),
runs AS (
  SELECT *, CAST(sum(chg) OVER (
      PARTITION BY {key} ORDER BY {ts}, {tiebreak}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT
    ) AS scd_version
  FROM obs
),
hist AS (
  SELECT {key}, scd_version,
         min({ts}) AS effective_from,
         {attr_mins}{n_obs_sel}
  FROM runs GROUP BY {key}, scd_version
)
SELECT {key}, scd_version, effective_from, {", ".join(attrs)}{n_obs_out},
       coalesce(lead(effective_from) OVER s, TIMESTAMP '{OPEN_END}')
         AS effective_to,
       lead(effective_from) OVER s IS NULL AS is_current
FROM hist
WINDOW s AS (PARTITION BY {key} ORDER BY scd_version)
"""


_ORDERS_SCD2_ORACLE = _scd2_oracle(
    "orders",
    "o_custkey",
    ["o_orderpriority", "o_orderstatus"],
    "o_orderdate",
    "o_orderkey",
    with_counts=True,
)


@query("dim_scd2_history", _ORDERS_SCD2_ORACLE)
def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-state history as an SCD2 dimension: each run of
    consecutive orders with unchanged (priority, status) collapses into
    one validity interval. Single-Exchange window plan."""
    orders = table(spark, sf_dir, "orders")
    hist = scd2_history(
        orders,
        keys=["o_custkey"],
        attrs=["o_orderpriority", "o_orderstatus"],
        ts_col="o_orderdate",
        tiebreak=["o_orderkey"],
    )
    return _close_open_end(hist)


_ORDERS_SCD2_NOCOUNT_ORACLE = _scd2_oracle(
    "orders",
    "o_custkey",
    ["o_orderpriority", "o_orderstatus"],
    "o_orderdate",
    "o_orderkey",
    with_counts=False,
)

_INCR_DIM_CACHE: dict[str, ManagedTable] = {}


@query("scd2_incremental_orders", _ORDERS_SCD2_NOCOUNT_ORACLE)
def scd2_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two scd2_apply folds over an orderkey-PARITY split of the feed —
    each batch interleaves in event time with the other, so the second
    fold inserts observations *between* already-applied ones (late-data
    path). The result must still equal the one-shot SQL history: the
    oracle checks order-insensitive incremental maintenance itself."""
    dim = _INCR_DIM_CACHE.get(sf_dir)
    if dim is None:
        orders = table(spark, sf_dir, "orders")
        obs_log = ManagedTable(scratch_dir("scd2_log_"))
        dim = ManagedTable(scratch_dir("scd2_dim_"))
        for parity in (0, 1):
            scd2_apply(
                spark,
                obs_log,
                dim,
                orders.filter(F.col("o_orderkey") % 2 == parity),
                keys=["o_custkey"],
                attrs=["o_orderpriority", "o_orderstatus"],
                ts_col="o_orderdate",
                tiebreak=["o_orderkey"],
            )
        _INCR_DIM_CACHE[sf_dir] = dim
    return _close_open_end(
        dim.read(spark).select(
            "o_custkey",
            "scd_version",
            "effective_from",
            "o_orderpriority",
            "o_orderstatus",
            "effective_to",
            "is_current",
        )
    )


_EVENTS_SCD2_ORACLE = _scd2_oracle(
    "events",
    "user_id",
    ["event_type"],
    "ts",
    "event_id",
    with_counts=False,
)

_STREAM_DIM_CACHE: dict[str, ManagedTable] = {}


@query("streaming_scd2_dimension", _EVENTS_SCD2_ORACLE)
def streaming_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2: the events feed drains as 3 micro-batches
    (repartition(3) files, maxFilesPerTrigger=1 — Spark orders file
    batches by mtime, NOT event time, so batches interleave arbitrarily).
    foreachBatch folds each through the same order-insensitive apply; the
    drained dim must hash-match the one-shot batch SQL over all events."""
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
    )

    dim = _STREAM_DIM_CACHE.get(sf_dir)
    if dim is None:
        events = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        src = scratch_dir("scd2_stream_src_")
        events.repartition(3).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        obs_log = ManagedTable(scratch_dir("scd2_stream_log_"))
        dim = ManagedTable(scratch_dir("scd2_stream_dim_"))
        q = scd2_stream_apply(
            stream,
            obs_log,
            dim,
            keys=["user_id"],
            attrs=["event_type"],
            ts_col="ts",
            checkpoint_dir=scratch_dir("scd2_stream_ckpt_"),
            tiebreak=["event_id"],
        )
        await_drained(q)
        _STREAM_DIM_CACHE[sf_dir] = dim
    return _close_open_end(
        dim.read(spark).select(
            "user_id",
            "scd_version",
            "effective_from",
            "event_type",
            "effective_to",
            "is_current",
        )
    )


# -- CDC APPLY CHANGES (SCD1 with deletes) -----------------------------------

_CDC_ORACLE = """
WITH feed AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
    (o_orderkey % 13 = 0) AS is_deleted,
    o_orderstatus, o_orderpriority, o_totalprice
  FROM orders
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM feed) WHERE rn = 1
)
SELECT o_custkey, o_orderdate AS last_ts, o_orderkey AS last_lsn,
  o_orderstatus, o_orderpriority, o_totalprice
FROM latest WHERE NOT is_deleted
"""

_CDC_DIM_CACHE: dict[str, "ManagedTable"] = {}


@query("cdc_apply_orders", _CDC_ORACLE)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO (operators/scd.py::cdc_apply): the orders feed
    replayed as a CDC stream — every 13th order is a DELETE — folded in
    two orderkey-PARITY batches, so each batch interleaves in event time
    with the other and late updates land after already-applied deletes.
    The surviving state must equal the one-shot latest-per-key SQL with
    tombstones excluded: that equality checks last-write-wins ordering,
    tombstone persistence, and order-insensitivity at once."""
    from databricks_etl_pipelines_spark.operators.scd import (
        cdc_apply,
        cdc_read_current,
    )

    dim = _CDC_DIM_CACHE.get(sf_dir)
    if dim is None:
        orders = table(spark, sf_dir, "orders")
        feed = orders.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
        )
        dim = ManagedTable(scratch_dir("cdc_dim_"))
        for parity in (0, 1):
            cdc_apply(
                spark,
                dim,
                feed.filter(F.col("o_orderkey") % 2 == parity),
                keys=["o_custkey"],
                ts_col="o_orderdate",
                lsn_col="o_orderkey",
                op_col="op",
            )
        _CDC_DIM_CACHE[sf_dir] = dim
    return cdc_read_current(dim, spark).select(
        "o_custkey",
        F.col("o_orderdate").alias("last_ts"),
        F.col("o_orderkey").alias("last_lsn"),
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice",
    )


_STREAM_CDC_CACHE: dict[str, "ManagedTable"] = {}


@query("streaming_cdc_dimension", _CDC_ORACLE)
def streaming_cdc_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming APPLY CHANGES: the orders CDC feed (every 13th order a
    DELETE) drains as 3 mtime-ordered micro-batches through
    cdc_stream_apply; the surviving dim must hash-match the same one-shot
    latest-per-key SQL as the batch fold — same oracle, third engine
    path (batch parity split == streaming drain == SQL)."""
    from databricks_etl_pipelines_spark.operators.scd import (
        cdc_read_current,
        cdc_stream_apply,
    )
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
    )

    dim = _STREAM_CDC_CACHE.get(sf_dir)
    if dim is None:
        orders = table(spark, sf_dir, "orders")
        feed = orders.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
        )
        src = scratch_dir("cdc_stream_src_")
        feed.repartition(3).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        dim = ManagedTable(scratch_dir("cdc_stream_dim_"))
        q = cdc_stream_apply(
            stream,
            dim,
            keys=["o_custkey"],
            ts_col="o_orderdate",
            lsn_col="o_orderkey",
            op_col="op",
            checkpoint_dir=scratch_dir("cdc_stream_ckpt_"),
        )
        await_drained(q)
        _STREAM_CDC_CACHE[sf_dir] = dim
    return cdc_read_current(dim, spark).select(
        "o_custkey",
        F.col("o_orderdate").alias("last_ts"),
        F.col("o_orderkey").alias("last_lsn"),
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice",
    )


# -- point-in-time dimension lookup (the SCD2 read path) ---------------------

_PIT_ORACLE = """
WITH su AS (
  SELECT user_id, CAST(floor("value" / 10) AS INT) AS tier, ts, event_id
  FROM events WHERE event_type = 'signup'
),
obs AS (
  SELECT user_id, tier, ts, event_id,
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN tier IS NOT DISTINCT FROM lag(tier) OVER w THEN 0 ELSE 1
    END AS chg
  FROM su
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, CAST(sum(chg) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT
    ) AS scd_version
  FROM obs
),
hist AS (
  SELECT user_id, scd_version, min(ts) AS effective_from,
         min(tier) AS tier
  FROM runs GROUP BY user_id, scd_version
),
vis AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, effective_from ORDER BY scd_version DESC
      ) AS rn
    FROM hist) WHERE rn = 1
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id,
  h.tier AS dim_tier, h.scd_version AS dim_version,
  h.effective_from AS dim_effective_from
FROM p ASOF JOIN vis h
  ON p.user_id = h.user_id AND p.ts >= h.effective_from
"""


@query("dim_scd2_point_in_time", _PIT_ORACLE)
def dim_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 READ path: every purchase looks up the signup-tier dim
    version valid AT ITS EVENT TIME. History from scd2_history; when two
    versions start at the same instant only the later one is visible
    (dedup per (key, effective_from)); the lookup is the union-window
    as-of join — ONE shuffle, no inequality join, no candidate blowup.
    DuckDB replays it with a native ASOF JOIN over the same history CTE;
    purchases before a user's first signup drop on both sides (inner
    as-of semantics)."""
    from pyspark.sql import Window

    from databricks_etl_pipelines_spark.operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.floor(F.col("value") / 10).cast("int").alias("tier"),
        "ts",
        "event_id",
    )
    hist = scd2_history(
        signups, ["user_id"], ["tier"], "ts", ["event_id"],
        with_counts=False,
    )
    vis_w = Window.partitionBy("user_id", "effective_from").orderBy(
        F.desc("scd_version")
    )
    vis = (
        hist.withColumn("__rn", F.row_number().over(vis_w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "scd_version", "effective_from", "tier")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = asof_join(
        purchases, vis, "user_id", "ts", "effective_from", right_prefix="d_"
    )
    return joined.filter(F.col("d_effective_from").isNotNull()).select(
        "user_id",
        "purchase_id",
        F.col("d_tier").alias("dim_tier"),
        F.col("d_scd_version").alias("dim_version"),
        F.col("d_effective_from").alias("dim_effective_from"),
    )


# -- SCD2 with deletes (intervals close at the delete, gaps remain) ----------

_SCD2_DELETES_ORACLE = f"""
WITH feed AS (
  SELECT o_custkey, o_orderpriority, o_orderstatus, o_orderdate, o_orderkey,
    CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS del
  FROM orders
),
src AS (
  SELECT o_custkey,
    CASE WHEN del = 1 THEN NULL ELSE o_orderpriority END AS o_orderpriority,
    CASE WHEN del = 1 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
    o_orderdate, o_orderkey, del
  FROM feed
),
obs AS (
  SELECT *,
    CASE WHEN row_number() OVER w = 1 THEN 1
         WHEN del IS NOT DISTINCT FROM lag(del) OVER w
          AND o_orderpriority IS NOT DISTINCT FROM lag(o_orderpriority) OVER w
          AND o_orderstatus IS NOT DISTINCT FROM lag(o_orderstatus) OVER w
         THEN 0 ELSE 1 END AS chg
  FROM src
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, CAST(sum(chg) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT
    ) AS scd_version
  FROM obs
),
hist AS (
  SELECT o_custkey, scd_version, min(o_orderdate) AS effective_from,
         min(o_orderpriority) AS o_orderpriority,
         min(o_orderstatus) AS o_orderstatus,
         max(del) AS del
  FROM runs GROUP BY o_custkey, scd_version
),
stitched AS (
  SELECT *, lead(effective_from) OVER s AS eff_to FROM hist
  WINDOW s AS (PARTITION BY o_custkey ORDER BY scd_version)
)
SELECT o_custkey, scd_version, effective_from,
  o_orderpriority, o_orderstatus,
  coalesce(eff_to, TIMESTAMP '{OPEN_END}') AS effective_to,
  eff_to IS NULL AS is_current
FROM stitched WHERE del = 0
"""


@query("dim_scd2_with_deletes", _SCD2_DELETES_ORACLE)
def dim_scd2_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 with DELETE events (every 13th order): the delete closes the
    open interval at its own timestamp and leaves a gap — version
    numbers skip the delete run, a key ending in a delete has no current
    row. The oracle replays the nulled-attrs + delete-marker run algebra
    verbatim, stitching BEFORE filtering so effective_to lands on the
    delete time."""
    orders = table(spark, sf_dir, "orders").withColumn(
        "op",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    hist = scd2_history(
        orders,
        keys=["o_custkey"],
        attrs=["o_orderpriority", "o_orderstatus"],
        ts_col="o_orderdate",
        tiebreak=["o_orderkey"],
        with_counts=False,
        op_col="op",
    )
    return _close_open_end(hist)
