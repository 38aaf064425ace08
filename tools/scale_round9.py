"""Round-9 operator scale experiment: per-key EMA fold, RRF fusion,
t-closeness audit, WOE/IV binning as the input multiplies.

Claims under test:

  * EMA — one user_id shuffle + in-group array folds; replication adds
    DISTINCT keys (the daily-ingest growth axis), so per-key state is
    constant and wall should be ~linear in rows. (The other axis —
    series length per key — is bounded by per-user activity and is the
    documented collect_list contract, same as sessionize.)
  * RRF fusion — both input rankings are k=20 caps; only the two
    scoring scans grow. Wall ~linear, fused stage constant 40 rows.
  * t-closeness — the QI×band grid is CONSTANT (segments × nations ×
    bands) however many rows flow into the one hash aggregate; wall
    ~linear, grid size asserted constant in the output.
  * WOE/IV — same shape: one fact hash-agg to a ~11-row bucket
    relation; wall ~linear, bucket count asserted constant.

Usage: python tools/scale_round9.py [reps ...]   (default: 1 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, table: str, rep: int, root: str, remap: dict) -> str:
    """rep copies of a table; columns in ``remap`` get offset per copy
    (disjoint key spaces — the new-entities growth axis), the rest pass
    through."""
    path = os.path.join(root, f"{table}_x{rep}.parquet")
    if not os.path.exists(path):
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        mult = max(rep, 1000)
        copies = df.withColumn(
            "c", F.explode(F.array(*[F.lit(c) for c in range(rep)]))
        )
        out = copies.select(
            *[
                (F.col(c) * mult + F.col("c")).alias(c)
                if c in remap
                else F.col(c)
                for c in df.columns
            ]
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def run_scale(spark, rep: int, root: str) -> dict:
    r: dict = {"rep": rep}

    ev = spark.read.parquet(
        replicate(spark, "events", rep, root, {"event_id", "user_id"})
    )
    r["events"] = ev.count()

    def ema() -> int:
        arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
        g = ev.groupBy("user_id").agg(arr.alias("rs"))
        xs = F.transform("rs", lambda x: x["value"])
        fold = F.aggregate(
            F.slice(xs, F.lit(2), F.size(xs) - 1),
            F.element_at(xs, 1),
            lambda a, x: (a + x) / F.lit(2.0),
        )
        return g.select("user_id", fold.alias("ema")).count()

    r["ema_s"], r["ema_keys"] = timed(ema)

    docs = spark.read.parquet(
        replicate(spark, "documents", rep, root, {"doc_id"})
    )

    def rrf() -> int:
        from databricks_etl_pipelines_spark.operators.similarity import (
            hash_embed_cosine_topk,
        )

        return hash_embed_cosine_topk(
            docs, "text", "doc_id", query_id=0, k=20
        ).count()

    r["rrf_cosine_arm_s"], r["rrf_cosine_rows"] = timed(rrf)

    cust = spark.read.parquet(replicate(spark, "customer", rep, root, set()))

    def tclose() -> int:
        b = (
            cust.select(
                "c_mktsegment",
                "c_nationkey",
                F.floor(F.col("c_acctbal") / 4000).cast("long").alias("band"),
            )
            .groupBy("c_mktsegment", "c_nationkey", "band")
            .agg(F.count("*").alias("c"))
        )
        gl = b.groupBy("band").agg(F.sum("c").alias("cg"))
        grid = b.groupBy("c_mktsegment", "c_nationkey").agg(
            F.sum("c").alias("n_g")
        ).crossJoin(F.broadcast(gl))
        return grid.count()

    r["tclose_s"], r["tclose_grid_rows"] = timed(tclose)

    li = spark.read.parquet(replicate(spark, "lineitem", rep, root, set()))

    def woe() -> int:
        return (
            li.select(
                F.floor(F.col("l_extendedprice") / 10000)
                .cast("long")
                .alias("bucket"),
                (F.col("l_returnflag") == "R").cast("long").alias("y"),
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("n"), F.sum("y").alias("n_event"))
            .count()
        )

    r["woe_s"], r["woe_buckets"] = timed(woe)

    def wmedian() -> int:
        from pyspark.sql import Window

        f2 = li.select(
            F.col("l_returnflag").alias("g"),
            F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("b"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        h2 = f2.groupBy("g", "b").agg(F.sum("w").alias("ws"))
        cum = h2.withColumn(
            "cw", F.sum("ws").over(Window.partitionBy("g").orderBy("b"))
        )
        tot = h2.groupBy("g").agg(F.sum("ws").alias("tw"))
        return (
            cum.join(F.broadcast(tot), "g")
            .filter(F.lit(2) * F.col("cw") >= F.col("tw"))
            .groupBy("g")
            .agg(F.min("b"))
            .count()
        )

    r["wmedian_phase1_s"], r["wmedian_groups"] = timed(wmedian)
    return r


def main() -> None:
    spark = get_spark("scale_round9")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r9_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
