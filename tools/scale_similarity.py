"""ANN scale experiment: probe latency of the similarity family as the
corpus grows — brute-force full scan vs persisted sign-LSH bucket probe
vs persisted IVF list probe.

The scale claim under test: brute cost is O(N); the persisted indexes
read only their pruned bucket/list directories (hive-partition pruning),
so probe wall time should stay near-flat while N grows 10×. Build cost
is paid once (build-once / probe-many).

Embeddings are deterministic synthetic 64-dim vectors (xxhash64-derived
uniform components), written to parquet so every path scans comparable
storage.

Usage: python tools/scale_similarity.py [N ...]   (default 20000 200000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.similarity import (  # noqa: E402
    IvfIndex,
    LshIndex,
    brute_force_cosine_topk,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

DIM = 64


def synth_embeddings(spark, n: int, root: str) -> str:
    path = os.path.join(root, f"emb_{n}.parquet")
    if not os.path.exists(path):
        comps = F.array(
            *[
                (
                    (F.xxhash64("id", F.lit(j)) % 2000) / F.lit(1000.0)
                ).cast("double")
                for j in range(DIM)
            ]
        )
        (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), comps.alias("embedding"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def run_scale(spark, n: int, root: str) -> dict:
    df = spark.read.parquet(synth_embeddings(spark, n, root))
    query = [float(((j * 37 + 11) % 2000) / 1000.0 - 1.0) for j in range(DIM)]
    r: dict = {"n": n}

    t0 = time.time()
    r["brute_rows"] = brute_force_cosine_topk(
        df, "embedding", "vec_id", query, k=10
    ).count()
    r["brute_s"] = round(time.time() - t0, 2)

    lsh_root = os.path.join(root, f"lsh_{n}")
    t0 = time.time()
    lsh = LshIndex.build(df, "embedding", "vec_id", lsh_root, dim=DIM, bits=8)
    r["lsh_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    r["lsh_rows"] = lsh.probe(spark, query, k=10).count()
    r["lsh_probe_s"] = round(time.time() - t0, 2)

    ivf_root = os.path.join(root, f"ivf_{n}")
    t0 = time.time()
    ivf = IvfIndex.build(
        df, "embedding", "vec_id", ivf_root, nlist=64,
        sample_fraction=min(1.0, 20000 / n),
    )
    r["ivf_build_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    r["ivf_rows"] = ivf.probe(spark, query, k=10, nprobe=4).count()
    r["ivf_probe_s"] = round(time.time() - t0, 2)
    return r


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    root = tempfile.mkdtemp(prefix="sim_scale_")
    spark = get_spark("similarity-scale")
    spark.sparkContext.setLogLevel("ERROR")
    run_scale(spark, 2_000, root)  # warmup: JIT scan/sort/kmeans paths
    for n in ns:
        print(json.dumps(run_scale(spark, n, root)), flush=True)


if __name__ == "__main__":
    main()
