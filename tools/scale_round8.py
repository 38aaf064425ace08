"""Round-8 operator scale experiment: BM25, containment join, aHash
near-dup, theta sketches as the corpus multiplies.

Claims under test (all "cost tracks the corpus LINEARLY, state stays
bounded"):

  * BM25 — the (doc, query-term) tf aggregate is the only corpus-sized
    stage (filter BEFORE the aggregate); df/N/avgdl are bounded side
    relations and the top-k is a TakeOrderedAndProject. Wall should be
    ~linear in rows.
  * containment join — candidate volume is bounded by rare-probe-shingle
    co-occurrence; pure replication is the ADVERSARIAL case (every copy
    shares all shingles → pair count grows ~rep² for the planted dups),
    so the probe reports candidate counts alongside wall time: the check
    is that wall tracks OUTPUT size, not input².
  * aHash near-dup — fingerprints are one mapInPandas scan; banding is a
    4-rows-per-doc shuffle. Same output-sensitivity note as containment.
  * theta sketch set ops — sketches cap at k rows whatever the input;
    wall should be ~linear (the hash-distinct scan) with CONSTANT
    retained state, asserted in the output.

Usage: python tools/scale_round8.py [reps ...]   (default: 1 4)
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


def build_docs(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"docs_x{rep}.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        copies = docs.select(
            "doc_id", "text",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        mult = max(rep, 1000)  # ids collide past rep=1000 otherwise
        out = copies.select(
            (F.col("doc_id") * mult + F.col("c")).alias("doc_id"), "text"
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def build_orders(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"orders_x{rep}.parquet")
    if not os.path.exists(path):
        orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        copies = orders.select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        mult = max(rep, 1000)  # ids collide past rep=1000 otherwise
        out = copies.select(
            (F.col("o_orderkey") * mult + F.col("c")).alias("o_orderkey"),
            (F.col("o_custkey") * mult + F.col("c")).alias("o_custkey"),
            "o_orderpriority", "o_orderdate",
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def run_scale(spark, rep: int, root: str) -> dict:
    docs = spark.read.parquet(build_docs(spark, rep, root))
    r: dict = {"rep": rep, "docs": docs.count()}

    from databricks_etl_pipelines_spark.operators.dedup import (
        containment_pairs,
    )
    from databricks_etl_pipelines_spark.operators.multimodal import (
        ahash_features,
        ahash_neardup_pairs,
        to_binary_docs,
    )

    # BM25 body (same shape as text_bm25_topk without the table() read)
    from databricks_etl_pipelines_spark.functions.textfns import (
        token_count,
        tokens,
    )

    def bm25() -> int:
        terms = ("dup", "spark", "vector", "window")
        words = docs.select(
            "doc_id", F.explode(tokens("text")).alias("word")
        )
        tf = (
            words.filter(F.col("word").isin(*terms))
            .groupBy("doc_id", "word")
            .agg(F.count("*").alias("c"))
        )
        dl = docs.select(
            "doc_id", token_count("text").alias("n_tokens")
        )
        return tf.join(dl, "doc_id").orderBy(
            F.desc("c"), "doc_id", "word"
        ).limit(20).count()

    r["bm25_s"], _ = timed(bm25)

    def cont() -> int:
        return containment_pairs(docs, "text", "doc_id", 0.8).count()

    r["containment_s"], r["containment_pairs"] = timed(cont)

    def phash() -> int:
        feats = ahash_features(to_binary_docs(docs, "text", "doc_id"))
        return ahash_neardup_pairs(feats, 8).count()

    r["phash_s"], r["phash_pairs"] = timed(phash)

    orders = spark.read.parquet(build_orders(spark, rep, root))
    from databricks_etl_pipelines_spark.operators.curation import (
        reservoir_key,
    )

    def theta() -> int:
        keys = orders.filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select(reservoir_key("o_custkey", 11).alias("hk")).distinct()
        bk = keys.orderBy("hk").limit(256)
        return bk.count()

    r["theta_s"], r["theta_retained"] = timed(theta)
    return r


def main() -> None:
    spark = get_spark("scale_round8")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r8_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
