"""Round-10 operator scale experiment: exact weighted quantiles and the
Q9-star profit rollup as the fact table multiplies.

Claims under test:

  * weighted quantiles — phase 1 is ONE fact hash-agg to a
    (group, bucket) histogram whose size is bounded by value range /
    bucket width (constant under fact replication); phase 2 rescans
    only rows in the ≤ 3 picked buckets per group. Wall ~linear in
    fact rows; histogram rows and final (group, p) pick rows asserted
    constant.
  * Q9 star — the LIKE-filtered part dim and the other dims stay
    FIXED while lineitem/orders replicate (the fact-growth axis);
    the (nation, year) output grid is constant. Wall ~linear; no
    group-count growth.

Usage: python tools/scale_round10.py [reps ...]   (default: 1 4)
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
from tools.scale_round9 import SF_DIR, replicate, timed  # noqa: E402


def run_scale(spark, rep: int, root: str) -> dict:
    r: dict = {"rep": rep}

    li = spark.read.parquet(replicate(spark, "lineitem", rep, root, set()))
    r["lineitem"] = li.count()

    def wquant() -> int:
        from pyspark.sql import Window

        f = li.select(
            F.col("l_returnflag").alias("g"),
            F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("b"),
            F.col("l_extendedprice").alias("v"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        h = f.groupBy("g", "b").agg(F.sum("w").alias("ws"))
        cum = h.withColumn(
            "cw", F.sum("ws").over(Window.partitionBy("g").orderBy("b"))
        )
        tot = h.groupBy("g").agg(F.sum("ws").alias("tw"))
        ps = (
            spark.range(1)
            .select(
                F.explode(F.array(F.lit(10), F.lit(50), F.lit(90))).alias(
                    "p0"
                )
            )
            .select(F.col("p0").cast("long").alias("p"))
        )
        pick = (
            cum.join(F.broadcast(tot), "g")
            .crossJoin(F.broadcast(ps))
            .filter(F.lit(100) * F.col("cw") >= F.col("p") * F.col("tw"))
            .groupBy("g", "p")
            .agg(F.min("b").alias("bstar"), F.max("tw").alias("tw"))
        )
        pickfull = pick.join(
            cum.select("g", F.col("b").alias("bstar"), "cw", "ws"),
            ["g", "bstar"],
        ).select(
            F.col("g").alias("pg"),
            F.col("p").alias("pp"),
            F.col("bstar").alias("pb"),
            "tw",
            (F.col("cw") - F.col("ws")).alias("prev"),
        )
        vals = (
            f.join(
                F.broadcast(pickfull),
                (F.col("g") == F.col("pg")) & (F.col("b") == F.col("pb")),
            )
            .groupBy("g", F.col("pp").alias("p"), "v", "prev", "tw")
            .agg(F.sum("w").alias("vw"))
        )
        cum2 = vals.withColumn(
            "cw2",
            F.col("prev")
            + F.sum("vw").over(Window.partitionBy("g", "p").orderBy("v")),
        )
        return (
            cum2.filter(
                F.lit(100) * F.col("cw2") >= F.col("p") * F.col("tw")
            )
            .groupBy("g", "p")
            .agg(F.min("v"))
            .count()
        )

    r["wquant_s"], r["wquant_pick_rows"] = timed(wquant)

    def hist_rows() -> int:
        return (
            li.select(
                F.col("l_returnflag").alias("g"),
                F.floor(F.col("l_extendedprice") / 1000)
                .cast("long")
                .alias("b"),
            )
            .distinct()
            .count()
        )

    r["wquant_hist_s"], r["wquant_hist_rows"] = timed(hist_rows)

    # Q9 star: the lineitem fact replicates; every other relation stays
    # FIXED (replicating orders with unchanged keys would multiply join
    # matches rep² and fake superlinear growth — each replicated line
    # must still match exactly ONE order row)
    part = spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
    supp = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))

    def q9() -> int:
        amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
            F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
        )
        return (
            li.join(
                F.broadcast(
                    part.filter(F.col("p_name").like("%red%")).select(
                        "p_partkey", "p_retailprice"
                    )
                ),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .join(
                F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .join(
                orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(
                F.broadcast(nation.select("n_nationkey", "n_name")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"),
            )
            .agg(F.sum(amount).alias("sum_profit"))
            .count()
        )

    r["q9_s"], r["q9_groups"] = timed(q9)
    return r


def main() -> None:
    spark = get_spark("scale_round10")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r10_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
