"""BPE depth scale experiment: train a DEEP merge list over a large
synthetic dictionary and encode with the depth-independent Arrow path.

The testdata corpus has a ~31-word vocabulary, so it can't exercise
production vocabulary depth. Here the dictionary is synthesized directly
(hex words from md5(id) — 16-char alphabet, long shared prefixes force
chained merges; Zipf-ish frequencies), handed to ``train_bpe`` via
``word_freqs``, trained to ``merges`` depth with the driver-local loop,
then the dictionary is encoded with ``apply_mode="arrow"`` (the expr
replace chain would exceed codegen limits at this depth).

Usage: python tools/scale_bpe.py [n_words] [n_merges]   (default 50000 4096)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.bpe import (  # noqa: E402
    encoded_dictionary,
    train_bpe,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 4_096
    spark = get_spark()
    wf = spark.range(n_words).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 12).alias("w"),
        (F.lit(n_words) / (F.col("id") + 1)).cast("bigint").alias("freq"),
    ).groupBy("w").agg(F.max("freq").alias("freq")).persist()
    dict_rows = wf.count()

    t0 = time.time()
    merges = train_bpe(None, None, num_merges=n_merges, word_freqs=wf)
    train_s = round(time.time() - t0, 2)

    t0 = time.time()
    enc = encoded_dictionary(
        None, None, merges, word_freqs=wf, apply_mode="arrow"
    )
    stats = enc.agg(
        F.count("*").alias("n"),
        F.sum("n_sym").alias("total_sym"),
        F.avg("n_sym").alias("avg_sym"),
    ).first()
    encode_s = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "dict_words": dict_rows,
                "merges_requested": n_merges,
                "merges_learned": len(merges),
                "train_s": train_s,
                "encode_arrow_s": encode_s,
                "avg_symbols_per_word": round(float(stats.avg_sym), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
