"""Round-10b operator scale experiment: the late-round additions (MAD
robust-z, trimmed mean, Holt linear, n-gram novelty) run as their REAL
registered queries over a synthetic sf-dir whose fact tables multiply.

Claims under test:

  * MAD / trimmed mean — every pass is a bounded hash-agg: the
    (group, bucket) histogram is bounded by value range / bucket width
    and must stay CONSTANT under fact replication; wall ~linear.
  * Holt linear — one user_id shuffle + per-key pair-state folds;
    replication adds DISTINCT users (new-entities axis), so per-key
    state is constant and wall ~linear; output rows grow exactly ×rep.
  * n-gram novelty — shingle explode is linear in corpus tokens; the
    replicated copies carry NEW doc_ids over identical text, so the
    first-seen relation is CONSTANT (same distinct shingles) while the
    probe side grows ×rep; wall ~linear.

Usage: python tools/scale_round10b.py [reps ...]   (default: 1 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from tools.scale_round9 import SF_DIR, replicate, timed  # noqa: E402

FIXED = ("region", "nation", "customer", "supplier", "part", "orders",
         "embeddings")


def build_sf_dir(spark, rep: int, root: str) -> str:
    """A runnable sf-dir: fixed dims symlinked, facts replicated —
    lineitem by plain row duplication (value-multiset axis), events
    with remapped (user_id, event_id) (new-entities axis), documents
    with remapped doc_id over identical text (re-post axis)."""
    d = os.path.join(root, f"sf_x{rep}")
    os.makedirs(d, exist_ok=True)
    for t in FIXED:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    for t, remap in (
        ("lineitem", set()),
        ("events", {"user_id", "event_id"}),
        ("documents", {"doc_id"}),
    ):
        src = replicate(spark, t, rep, root, remap)
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def run_scale(spark, rep: int, root: str) -> dict:
    load_all()
    sf = build_sf_dir(spark, rep, root)
    r: dict = {"rep": rep}
    r["lineitem"] = spark.read.parquet(f"{sf}/lineitem.parquet").count()

    for q in (
        "agg_mad_robust_z",
        "agg_trimmed_mean_exact",
        "agg_weighted_quantiles",
        "agg_weighted_median_twophase",
        "window_holt_linear",
        "text_ngram_novelty",
        "diag_bootstrap_ci",
    ):
        r[f"{q}_s"], r[f"{q}_rows"] = timed(
            lambda q=q: QUERIES[q](spark, sf).count()
        )

    # bounded-state assertions: the cents histogram the two-phase
    # family hash-aggregates to, and the novelty first-seen relation
    def hist() -> int:
        return (
            spark.read.parquet(f"{sf}/lineitem.parquet")
            .select(
                F.col("l_returnflag").alias("g"),
                F.floor(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                    / F.lit(100000)
                ).cast("long").alias("b"),
            )
            .distinct()
            .count()
        )

    r["cents_hist_s"], r["cents_hist_rows"] = timed(hist)

    def first_seen() -> int:
        from databricks_etl_pipelines_spark.functions.textfns import (
            distinct_shingles,
        )

        return (
            spark.read.parquet(f"{sf}/documents.parquet")
            .select(F.explode(distinct_shingles("text", 3)).alias("sh"))
            .select("sh")
            .distinct()
            .count()
        )

    r["novelty_shingles_s"], r["novelty_shingles_rows"] = timed(first_seen)
    return r


def main() -> None:
    spark = get_spark("scale_round10b")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r10b_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
