"""Scale experiment for the round-7 text/curation additions: corpus-side
cost must scale with CORPUS size while the tokenizer machinery stays
dictionary-bound.

Method: replicate the sf0.1 documents table REP times with unique doc
ids (same 31-word vocabulary — replication grows the corpus, not the
dictionary, exactly like a larger crawl of the same language) and time

  * curation_perplexity_buckets - words join + integer-lattice agg +
    bounded-histogram cutoffs: expected ~linear in corpus rows;
  * text_unigram_doc_stats     - dictionary segmentation (constant) +
    broadcast join + one corpus aggregate: expected ~linear;
  * text_unigram_segment       - dictionary-sized end to end: expected
    ~FLAT (the corpus only contributes one word-count aggregate);
  * unigram EM training        - same claim for the TRAINED model:
    per-iteration cost is dictionary x lattice work + a vocabulary-
    sized collect, independent of corpus rows;
  * decontaminate_score        - broadcast marker join: ~linear.

Usage: python tools/scale_unigram.py [reps...]   (default: 1 5 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.bpe import (  # noqa: E402
    word_frequencies,
)
from databricks_etl_pipelines_spark.operators.curation import (  # noqa: E402
    benchmark_ngrams,
    decontaminate_score,
    perplexity_buckets,
)
from databricks_etl_pipelines_spark.operators.unigram import (  # noqa: E402
    em_segment_dictionary,
    segment_dictionary,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, rep: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if rep == 1:
        return base
    return base.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
    ).select(
        (F.col("doc_id") * rep + F.col("__r")).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark()
    results = []
    for rep in reps:
        docs = replicated(spark, rep).persist()
        n = docs.count()
        bench = benchmark_ngrams(
            docs.filter(F.col("source") == "src0"), "text", 3
        ).persist()
        bench.count()
        row = {"rep": rep, "rows": n}
        row["perplexity_buckets"] = timed(
            lambda: perplexity_buckets(docs, "text", "doc_id", "lang").count()
        )
        words = word_frequencies(docs, "text", 10_000)
        row["unigram_segment"] = timed(
            lambda: segment_dictionary(words, 6, 48).count()
        )
        row["unigram_em"] = timed(
            lambda: em_segment_dictionary(
                words, 6, 48, iters=2, prune_per_iter=6
            ).count()
        )
        seg = segment_dictionary(words, 6, 48).select(
            F.col("word").alias("__w"), "n_pieces"
        )
        row["unigram_doc_stats"] = timed(
            lambda: docs.select(
                "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("__w")
            )
            .join(F.broadcast(seg), "__w")
            .groupBy("doc_id")
            .agg(F.sum("n_pieces"))
            .count()
        )
        row["decontaminate_score"] = timed(
            lambda: decontaminate_score(
                docs.filter(F.col("source") != "src0"), bench,
                "text", "doc_id", 3, 5,
            ).count()
        )
        docs.unpersist()
        bench.unpersist()
        results.append(row)
        print(json.dumps(row))
    base = results[0]
    last = results[-1]
    scale = last["rows"] / base["rows"]
    print(json.dumps({
        "scale_factor": scale,
        "ratios": {
            k: round(last[k] / max(base[k], 0.01), 2)
            for k in ("perplexity_buckets", "unigram_segment",
                      "unigram_em", "unigram_doc_stats",
                      "decontaminate_score")
        },
    }))


if __name__ == "__main__":
    main()
