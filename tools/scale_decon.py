"""Decontamination scale experiment: wall-clock growth of
``decontaminate_report`` as the CORPUS multiplies while the benchmark
stays eval-sized — the exact 100 TB shape (the benchmark side never
grows with the corpus).

Method: the sf0.1 ``src0`` documents play the benchmark (fixed), the
other sources replicated REP times (per-copy unique suffix token so the
corpus n-gram multiset grows honestly) play the training corpus. The
claim under test: wall time grows ~linearly in REP because the benchmark
n-gram set broadcasts and the only shuffle input is the MATCHING n-grams
(a corpus-size-independent fraction per doc). Superlinear growth or a
shuffle of the corpus n-gram explosion would falsify the operator's
100 TB story.

Usage: python tools/scale_decon.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.curation import (  # noqa: E402
    decontaminate_report,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"decon_x{rep}.parquet")
    if not os.path.exists(path):
        docs = (
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .filter(F.col("source") != "src0")
        )
        copies = docs.select(
            "doc_id", "text",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        out = copies.select(
            (F.col("doc_id") * 1000 + F.col("c")).alias("doc_id"),
            F.concat(
                "text", F.lit(" uniq"),
                F.col("doc_id").cast("string"), F.lit("_"),
                F.col("c").cast("string"),
            ).alias("text"),
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark()
    bench = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter(F.col("source") == "src0")
        .select("doc_id", "text")
    )
    n_bench = bench.count()
    root = tempfile.mkdtemp(prefix="scale_decon_")
    results = []
    try:
        for rep in reps:
            path = build_corpus(spark, rep, root)
            corpus = spark.read.parquet(path)
            n_corpus = corpus.count()
            # warm-up then timed run (min of 2) so JIT doesn't dominate
            times = []
            for _ in range(2):
                t0 = time.time()
                report = decontaminate_report(
                    corpus, bench, "text", "doc_id", ngram_n=3, min_hits=5
                )
                n_flagged = report.filter("contaminated").count()
                n_rows = report.count()
                times.append(time.time() - t0)
            plan = report._jdf.queryExecution().executedPlan().toString()
            bhj = "BroadcastHashJoin" in plan
            results.append({
                "rep": rep, "corpus_docs": n_corpus, "bench_docs": n_bench,
                "rows": n_rows, "flagged": n_flagged,
                "sec_cold": round(times[0], 2), "sec_warm": round(times[1], 2),
                "bench_side_broadcast": bhj,
            })
            print(json.dumps(results[-1]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    base = results[0]["sec_warm"] or 0.01
    for r in results:
        r["warm_vs_x1"] = round(r["sec_warm"] / base, 2)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
