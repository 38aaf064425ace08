"""Dedup scale experiment: wall-clock growth of the heavy dedup operators
as the corpus multiplies, with per-stage timings for MinHash-LSH.

Method (same workload as the round-3 5x experiment, extended): replicate
the sf0.1 documents table REP times, appending a per-copy unique suffix
token so every copy near-dups its REP-1 siblings — a deliberately HARDER
corpus than plain replication (the true-pair count grows ~C(REP,2) per
base doc while input rows grow only REP times). Sub-quadratic wall growth
then demonstrates candidate generation is bounded by bucket co-occurrence
plus OUTPUT size, not n².

Usage: python tools/scale_dedup.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.dedup import (  # noqa: E402
    _hashed_shingle_sets,
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, rep: int, root: str) -> str:
    """documents x rep with per-copy unique suffix tokens, written to
    parquet so every timed run scans comparable storage."""
    path = os.path.join(root, f"docs_x{rep}.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        copies = docs.select(
            "doc_id", "text",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        out = copies.select(
            (F.col("doc_id") * 1000 + F.col("c")).alias("doc_id"),
            F.concat(
                "text",
                F.lit(" uniq"),
                F.col("doc_id").cast("string"),
                F.lit("_"),
                F.col("c").cast("string"),
            ).alias("text"),
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def run_scale(spark, rep: int, root: str) -> dict:
    df = spark.read.parquet(build_corpus(spark, rep, root))
    n = df.count()
    r: dict = {"rep": rep, "docs": n}

    t0 = time.time()
    groups = exact_dedup_groups(df, "text", "doc_id").count()
    r["exact_s"], r["exact_groups"] = round(time.time() - t0, 2), groups

    # MinHash-LSH staged: shingle -> band/bucket/candidates -> verify
    t0 = time.time()
    sh = _hashed_shingle_sets(df, "text", "doc_id", 3)
    sh.count()  # force the persisted shingle relation
    r["mh_shingle_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    cands = minhash_lsh_candidates(
        df, "text", "doc_id", hashed_sets=sh
    ).persist()
    r["mh_candidates"] = cands.count()
    r["mh_band_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    paired = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    r["mh_pairs"] = paired.filter(jac >= 0.7).count()
    r["mh_verify_s"] = round(time.time() - t0, 2)
    r["mh_total_s"] = round(
        r["mh_shingle_s"] + r["mh_band_s"] + r["mh_verify_s"], 2
    )
    cands.unpersist()
    sh.unpersist()

    t0 = time.time()
    r["ppjoin_pairs"] = ngram_jaccard_pairs(df, "text", "doc_id").count()
    r["ppjoin_s"] = round(time.time() - t0, 2)
    return r


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    import tempfile

    root = tempfile.mkdtemp(prefix="dedup_scale_")
    spark = get_spark("dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT the scan/agg path once
    run_scale(spark, 1, root)
    for rep in reps:
        print(json.dumps(run_scale(spark, rep, root)), flush=True)


if __name__ == "__main__":
    main()
