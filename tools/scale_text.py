"""Text-operator scale experiment: DSIR scoring and BPE training as the
corpus multiplies.

Both operators split into a corpus-sized stage and a bounded stage, and
the claim under test is that ONLY the corpus-sized stage grows:

  * DSIR — one explode+hash pass into (doc, bucket) counts; the profile
    is a rollup of that aggregate (n_buckets rows), scoring a broadcast
    join. Wall should grow ~linearly with rows, nothing worse.
  * BPE — word counting is corpus-sized; every merge step runs on the
    CAPPED dictionary, so the per-merge cost must stay FLAT as the corpus
    multiplies (replication adds occurrences, not words).

Usage: python tools/scale_text.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.bpe import (  # noqa: E402
    train_bpe,
    word_frequencies,
)
from databricks_etl_pipelines_spark.operators.curation import (  # noqa: E402
    dsir_importance_weights,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"docs_x{rep}.parquet")
    if not os.path.exists(path):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        copies = docs.select(
            "doc_id", "text", "source",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        out = copies.select(
            (F.col("doc_id") * 1000 + F.col("c")).alias("doc_id"),
            "text", "source",
        )
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def run_scale(spark, rep: int, root: str) -> dict:
    df = spark.read.parquet(build_corpus(spark, rep, root))
    n = df.count()
    r: dict = {"rep": rep, "docs": n}

    t0 = time.time()
    dsir = dsir_importance_weights(
        df, "text", "doc_id",
        F.col("source").isin("src1", "src2", "src3"), n_buckets=64,
    )
    r["dsir_rows"] = dsir.count()
    r["dsir_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    vocab = word_frequencies(df, "text", 10_000).count()
    r["wordcount_s"], r["vocab"] = round(time.time() - t0, 2), vocab

    t0 = time.time()
    merges = train_bpe(df, "text", num_merges=8, max_words=10_000)
    r["bpe_train_s"] = round(time.time() - t0, 2)
    r["bpe_merges"] = len(merges)
    return r


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark("scale-text")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="scale_text_") as root:
        run_scale(spark, reps[0], root)  # warmup: JIT + codegen
        for rep in reps:
            print(json.dumps(run_scale(spark, rep, root)), flush=True)


if __name__ == "__main__":
    main()
