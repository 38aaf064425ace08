"""Repeated-span report scale experiment: wall-clock growth of
``duplicated_span_report`` as the corpus multiplies.

Replicating documents VERBATIM is the adversarial case for span detection:
every 8-gram of every replicated doc becomes duplicated, so the hit join
and the coverage explode both run at their maximum density (output rows ~
total token positions). Sub-linear-per-row growth then shows the operator
is bounded by corpus size + output size, never pairwise in the number of
copies — the property that distinguishes the REPORT form from pair
listing (a pair lister on this corpus would emit C(rep,2) pairs per
duplicated gram).

Usage: python tools/scale_spans.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.dedup import (  # noqa: E402
    duplicated_span_report,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"docs_x{rep}.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        copies = docs.select(
            "doc_id", "text",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        out = copies.select(
            (F.col("doc_id") * 1000 + F.col("c")).alias("doc_id"), "text"
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def run_scale(spark, rep: int, root: str) -> dict:
    df = spark.read.parquet(build_corpus(spark, rep, root))
    n = df.count()
    t0 = time.time()
    rep_df = duplicated_span_report(df, "text", "doc_id", n=8, min_docs=2)
    agg = rep_df.agg(
        F.count("*").alias("docs"),
        F.sum("dup_ngrams").alias("dup_ngrams"),
        F.sum("covered_tokens").alias("covered"),
    ).collect()[0]
    return {
        "rep": rep,
        "docs": n,
        "wall_s": round(time.time() - t0, 2),
        "dup_ngrams": int(agg.dup_ngrams),
        "covered_tokens": int(agg.covered),
    }


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark("scale-spans")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="scale_spans_") as root:
        # warmup on the smallest corpus so run 1 isn't charged JIT cost
        run_scale(spark, reps[0], root)
        for rep in reps:
            print(json.dumps(run_scale(spark, rep, root)), flush=True)


if __name__ == "__main__":
    main()
