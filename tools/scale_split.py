"""Leakage-safe-split scale experiment: wall-clock growth of the split
with the exact PPJoin pair generator (oracle default) vs the banded
MinHash-LSH generator (the 100 TB path, now pluggable via ``pair_fn``).

Method mirrors tools/scale_dedup.py: replicate the sf0.1 documents table
REP times with per-copy unique suffix tokens, so every copy near-dups its
REP-1 siblings and the true near-dup PAIR count grows ~C(REP,2) per base
doc while rows grow only REP times. PPJoin must enumerate every true pair
(its output IS the pair list), so its wall tracks the quadratic pair
count; MinHash candidate generation is bounded by band-bucket
co-occurrence (bucket caps), so split wall stays ~linear in rows + output.
Both feed the SAME connected-components + cluster-hash split, so the
comparison isolates pair generation.

Usage: python tools/scale_split.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_etl_pipelines_spark.operators.curation import (  # noqa: E402
    leakage_safe_split,
)
from databricks_etl_pipelines_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_dedup_pairs,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from tools.scale_dedup import build_corpus  # noqa: E402


def run_scale(spark, rep: int, root: str, ppjoin_max_rep: int) -> dict:
    df = spark.read.parquet(build_corpus(spark, rep, root))
    n = df.count()
    r: dict = {"rep": rep, "docs": n}

    t0 = time.time()
    out = leakage_safe_split(
        df, "text", "doc_id", test_fraction=0.1, threshold=0.5,
        pair_fn=minhash_lsh_dedup_pairs,
    )
    agg = out.groupBy("split").count().collect()
    r["minhash_split_s"] = round(time.time() - t0, 2)
    r["split_counts"] = {x["split"]: x["count"] for x in agg}

    if rep <= ppjoin_max_rep:
        t0 = time.time()
        out = leakage_safe_split(
            df, "text", "doc_id", test_fraction=0.1, threshold=0.5
        )
        agg = out.groupBy("split").count().collect()
        r["ppjoin_split_s"] = round(time.time() - t0, 2)
        r["ppjoin_split_counts"] = {x["split"]: x["count"] for x in agg}
    return r


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark()
    with tempfile.TemporaryDirectory(prefix="scale_split_") as root:
        for rep in reps:
            print(json.dumps(run_scale(spark, rep, root, ppjoin_max_rep=5)))


if __name__ == "__main__":
    main()
