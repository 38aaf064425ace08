"""Round-11c operator scale experiment: the retrieval additions (MMR
re-rank, Kendall tau) and the streaming drift trio run as their REAL
registered queries over a synthetic sf-dir whose documents/events
tables multiply.

Claims under test:

  * MMR — the candidate cut is the standard top-n retrieval (corpus
    scan, linear); everything after runs on ≤ n_cands² bounded rows,
    so the re-rank overhead above the plain top-k must stay CONSTANT
    under corpus replication (replicas carry NEW doc_ids over
    identical text — the candidate pool changes, the bounded-greedy
    cost does not).
  * Kendall — both rankings are k-capped; the pair stage is ≤ k²
    rows at any corpus size; wall tracks the two BM25 scans only.
  * streaming KS/PSI/CvM — per-batch cost tracks batch + the
    lattice-bounded histogram; the maintained aggregate's row count
    must stay CONSTANT under event replication (same distinct
    (type, cent) cells, counts ×rep).

Usage: python tools/scale_round11c.py [reps ...]   (default: 1 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from tools.scale_round9 import SF_DIR, replicate, timed  # noqa: E402

FIXED = ("region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "embeddings")


def build_sf_dir(spark, rep: int, root: str) -> str:
    d = os.path.join(root, f"sf_x{rep}")
    os.makedirs(d, exist_ok=True)
    for t in FIXED:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    src = replicate(spark, "documents", rep, root, {"doc_id"})
    dst = os.path.join(d, "documents.parquet")
    if not os.path.exists(dst):
        os.symlink(src, dst)
    # events must be a single parquet FILE (not a Spark output dir):
    # streaming_events exposes it through a scratch-dir symlink, and a
    # dir-behind-symlink is invisible to the non-recursive file-stream
    # listing (the testdata layout is a single file too)
    ev_dst = os.path.join(d, "events.parquet")
    if not os.path.exists(ev_dst):
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        ev_dir = replicate(spark, "events", rep, root, {"user_id", "event_id"})
        tbl = ds.dataset(ev_dir, format="parquet").to_table()
        pq.write_table(tbl, ev_dst)
    return d


def run_scale(spark, rep: int, root: str) -> dict:
    load_all()
    sf = build_sf_dir(spark, rep, root)
    r: dict = {"rep": rep}
    r["documents"] = spark.read.parquet(f"{sf}/documents.parquet").count()

    for q in (
        "similarity_mmr_rerank",
        "similarity_text_hash_topk",
        "text_kendall_rankings",
        "streaming_ks_drift",
        "streaming_psi_drift",
        "streaming_cvm_drift",
    ):
        r[f"{q}_s"], r[f"{q}_rows"] = timed(
            lambda q=q: QUERIES[q](spark, sf).count()
        )

    # bounded-state assertions ------------------------------------------------
    # the MMR pair matrix is n_cands(n_cands-1) rows at ANY corpus size
    r["mmr_overhead_s"] = round(
        r["similarity_mmr_rerank_s"] - r["similarity_text_hash_topk_s"], 2
    )
    # the maintained drift histogram: constant distinct (type, cent)
    from databricks_etl_pipelines_spark.plans.queries_stats import (
        _two_cohort_partial,
    )
    from databricks_etl_pipelines_spark.sources.tables import table

    r["hist_s"], r["hist_rows"] = timed(
        lambda: _two_cohort_partial(table(spark, sf, "events")).count()
    )
    return r


def main() -> None:
    spark = get_spark("scale_round11c")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r11c_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))
    # the drift histogram must not grow under replication
    assert out[-1]["hist_rows"] == out[0]["hist_rows"]
    # MMR and Kendall outputs are k-capped at any scale
    assert all(o["similarity_mmr_rerank_rows"] == 5 for o in out)
    assert all(o["text_kendall_rankings_rows"] == 1 for o in out)


if __name__ == "__main__":
    main()
