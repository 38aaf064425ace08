"""SQL-string entry point (EP4 parity).

The reference exposes a SQL surface alongside the DataFrame API (`%sql`
cells: DESCRIBE HISTORY at `01_Bronze_FinServ_Streaming.py:252`, OPTIMIZE /
ZORDER at `03_Gold_Aggregates_Features.py:207-216`). This engine is
API-first, but users coming from SQL get the same capability here:

  * ``register_tables`` — expose the testdata star schema as temp views so
    ``spark.sql("SELECT ... FROM lineitem ...")`` just works (Catalyst
    treats a view scan identically to the DataFrame read: pushdown,
    pruning, codegen all apply).
  * ``run_sql`` — one-call convenience: register + execute.
  * ``describe_history`` / ``optimize_table`` — the Delta-ism commands as
    functions over ``ManagedTable`` (DESCRIBE HISTORY / OPTIMIZE ZORDER
    analogs), returning DataFrames like their SQL forms would.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from databricks_etl_pipelines_spark.sources.managed_table import ManagedTable
from databricks_etl_pipelines_spark.sources.tables import TPCH_TABLES, table


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: Sequence[str] = TPCH_TABLES,
) -> None:
    """Create/replace one temp view per testdata table."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the star schema and run a SQL string against it."""
    register_tables(spark, sf_dir)
    return spark.sql(sql)


def describe_history(spark: SparkSession, mt: ManagedTable) -> DataFrame:
    """DESCRIBE HISTORY <table> (reference 01:252)."""
    return mt.history(spark)


def optimize_table(
    spark: SparkSession,
    mt: ManagedTable,
    zorder_by: Sequence[str] | None = None,
) -> int:
    """OPTIMIZE <table> [ZORDER BY (cols)] (reference 03:207-216)."""
    return mt.optimize(spark, cluster_by=zorder_by)


_HISTORY_RE = re.compile(r"^\s*DESCRIBE\s+HISTORY\s+(?:'([^']+)'|(\S+))\s*$", re.I)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?:'([^']+)'|(\S+))"
    r"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*$",
    re.I,
)
_TIME_TRAVEL_RE = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(?:'([^']+)'|(\S+))\s+"
    r"VERSION\s+AS\s+OF\s+(\d+)\s*$",
    re.I,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?:'([^']+)'|(\S+))\s+WHERE\s+(.+?)\s*$", re.I
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?:'([^']+)'|(\S+))(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*$",
    re.I,
)
_APPLY_CHANGES_RE = re.compile(
    r"^\s*APPLY\s+CHANGES\s+INTO\s+(?:'([^']+)'|(\S+))\s+FROM\s+(\S+)\s+"
    r"KEYS\s*\(([^)]+)\)\s+SEQUENCE\s+BY\s+(\w+)(?:\s*,\s*(\w+))?"
    r"(?:\s+APPLY\s+AS\s+DELETE\s+WHEN\s+(\w+)\s*=\s*'([^']*)')?"
    r"(?:\s+STORED\s+AS\s+SCD\s+TYPE\s+([12]))?\s*$",
    re.I,
)


def run_command(spark: SparkSession, sql: str) -> DataFrame:
    """The reference's ``%sql`` Delta verbs as actual SQL strings over
    ManagedTable paths (01:252, 03:207-216):

        DESCRIBE HISTORY '<path>'
        OPTIMIZE '<path>' [ZORDER BY (col, ...)]
        SELECT * FROM '<path>' VERSION AS OF <n>
        DELETE FROM '<path>' WHERE <predicate>
        VACUUM '<path>' [RETAIN <n> VERSIONS]
        APPLY CHANGES INTO '<path>' FROM <view> KEYS (k, ...)
            SEQUENCE BY <ts>[, <lsn>]
            [APPLY AS DELETE WHEN <op> = '<val>']
            [STORED AS SCD TYPE 1|2]

    APPLY CHANGES is the DLT CDC verb over operators/scd.py: SCD TYPE 1
    (default) folds through cdc_apply (last-write-wins + tombstones) and
    returns the live rows; SCD TYPE 2 folds through scd2_apply (validity
    intervals, observation log at '<path>__log') and returns the full
    history. Anything else falls through to ``spark.sql`` unchanged, so
    the command surface composes with the registered relational views."""
    from pyspark.sql import functions as F

    m = _HISTORY_RE.match(sql)
    if m:
        return ManagedTable(m.group(1) or m.group(2)).history(spark)
    m = _OPTIMIZE_RE.match(sql)
    if m:
        mt = ManagedTable(m.group(1) or m.group(2))
        cols = (
            [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
        )
        v = mt.optimize(spark, cluster_by=cols)
        return spark.createDataFrame(
            [(mt.root, v)], "table string, new_version int"
        )
    m = _TIME_TRAVEL_RE.match(sql)
    if m:
        return ManagedTable(m.group(1) or m.group(2)).read(
            spark, version=int(m.group(3))
        )
    m = _DELETE_RE.match(sql)
    if m:
        mt = ManagedTable(m.group(1) or m.group(2))
        v = mt.delete_where(spark, F.expr(m.group(3)))
        return spark.createDataFrame(
            [(mt.root, v)], "table string, new_version int"
        )
    m = _VACUUM_RE.match(sql)
    if m:
        mt = ManagedTable(m.group(1) or m.group(2))
        keep = int(m.group(3)) if m.group(3) else 1
        dropped = mt.vacuum(keep_last=keep)
        return spark.createDataFrame(
            [(mt.root, len(dropped))], "table string, versions_vacuumed int"
        )
    m = _APPLY_CHANGES_RE.match(sql)
    if m:
        from databricks_etl_pipelines_spark.operators.scd import (
            cdc_apply,
            cdc_read_current,
        )

        mt = ManagedTable(m.group(1) or m.group(2))
        src = spark.table(m.group(3))
        keys = [k.strip() for k in m.group(4).split(",")]
        ts_col, lsn_col = m.group(5), m.group(6)
        if lsn_col is None:
            # single-column SEQUENCE BY (valid DLT syntax): the event
            # timestamp alone orders the feed; synthesize a constant
            # tiebreak so the two-level fold downstream needs no schema
            # change (a duplicated ts column would be ambiguous in the
            # fold's extrema struct). Pick a name absent from the source
            # so withColumn never clobbers real feed data.
            lsn_col = "__lsn"
            while lsn_col in src.columns:
                lsn_col += "_"
            src = src.withColumn(lsn_col, F.lit(0))
        op_col, delete_op = m.group(7), m.group(8)
        scd_type = m.group(9)
        if scd_type == "2":
            # STORED AS SCD TYPE 2: full validity-interval history via the
            # order-insensitive log-rebuild fold; the observation log lives
            # next to the dim. APPLY AS DELETE closes the open interval at
            # the delete's timestamp (gap until the next observation).
            from databricks_etl_pipelines_spark.operators.scd import (
                scd2_apply,
            )

            attrs = [
                c for c in src.columns
                if c not in (*keys, ts_col, lsn_col, op_col)
            ]
            scd2_apply(
                spark, ManagedTable(mt.root + "__log"), mt, src,
                keys, attrs, ts_col, tiebreak=[lsn_col],
                op_col=op_col, delete_op=delete_op,
            )
            return mt.read(spark)
        if op_col is None:  # pure-upsert feed: stamp a constant op
            src = src.withColumn("__op", F.lit("U"))
            op_col, delete_op = "__op", "D"
        cdc_apply(
            spark, mt, src, keys, ts_col, lsn_col, op_col,
            delete_op=delete_op,
        )
        return cdc_read_current(mt, spark)
    return spark.sql(sql)
