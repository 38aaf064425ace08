"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a single scan + projection +
TakeOrderedAndProject; exact, and at 100 TB still embarrassingly parallel
(no shuffle, k·partitions rows to the driver).

Scale path: LSH bucketing (deterministic random-hyperplane signatures) —
probes only matching buckets, trading recall for a ~2^bits scan reduction.
IVF-style coarse quantization is the same pattern with learned centroids;
the bucketed join shape below is the Spark-side skeleton either way.

A vectorized Pandas-UDF cosine (`pandas_cosine`) is provided for wide
vectors where Arrow+numpy beats the expression evaluator; default stays
expression-side (no Python in the row path).

Algorithm provenance (public literature): random-hyperplane sign LSH
(Charikar 2002); IVF coarse quantization (Sivic & Zisserman "Video
Google" 2003 bag-of-words inverted files; Jégou et al., "Product
quantization for nearest neighbor search", 2011 — IVF without the PQ
refinement stage).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from databricks_etl_pipelines_spark.functions.vectors import (
    as_double_array,
    cosine,
    vec_lit,
)


def brute_force_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector. Ties break on id so
    the result is a deterministic set."""
    v = as_double_array(vec_col)
    q = F.transform(vec_lit(query), lambda x: x.cast("double"))
    sim = cosine(v, q)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def _sign_signature(vec: Column, planes: np.ndarray) -> Column:
    """Packed int signature: bit i = sign(dot(vec, plane_i)) ≥ 0."""
    sig = None
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d >= 0, 2**i).otherwise(0)
        sig = bit if sig is None else sig + bit
    return sig.cast("bigint")


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only the LSH bucket the query falls in.

    At scale, persist the signature as a partition column so bucket probes
    are partition-pruned scans instead of full scans + filter."""
    planes = hyperplanes(len(query), bits, seed)
    v = as_double_array(vec_col)
    qvec = np.asarray(query, dtype=float)
    qsig = sum(
        (1 << i) for i, p in enumerate(planes) if float(np.dot(qvec, p)) >= 0
    )
    q = F.transform(vec_lit(query), lambda x: x.cast("double"))
    sim = cosine(v, q)
    return (
        df.withColumn("__sig", _sign_signature(v, planes))
        .filter(F.col("__sig") == qsig)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    nlist: int = 64,
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 5,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: learn ``nlist`` centroids (distributed KMeans)
    and assign every vector to its nearest list.

    Returns (assignments ``(id, v, list_id)``, centroids array). At scale
    the assignment DataFrame is written out partitioned/bucketed by
    ``list_id`` ONCE, so each probe is a partition-pruned scan of
    nprobe/nlist of the data; centroids (nlist × dim floats) are tiny and
    live with the index metadata. Fit on a sample (``sample_fraction``) —
    centroid quality needs representative data, not all of it.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = df.select(
        F.col(id_col).alias("id"), as_double_array(vec_col).alias("v")
    )
    train = base if sample_fraction is None else base.sample(
        fraction=sample_fraction, seed=seed
    )
    # bucketing needs rough centroids, not convergence: few iterations,
    # random init (k-means|| costs extra distributed passes)
    model = KMeans(
        k=nlist, seed=seed, featuresCol="features",
        maxIter=max_iter, initMode="random",
    ).fit(train.select(array_to_vector("v").alias("features")))
    centroids = np.stack([c for c in model.clusterCenters()])
    assigned = model.transform(
        base.select("id", "v", array_to_vector("v").alias("features"))
    ).select("id", "v", F.col("prediction").alias("list_id"))
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 5,
) -> DataFrame:
    """IVF approximate top-k: rank centroids by distance to the query on the
    driver (nlist floats — trivial), scan only the ``nprobe`` nearest
    inverted lists, exact cosine within them. The learned-centroid upgrade
    of ``lsh_ann_topk`` — same bucketed-probe shape, data-adaptive buckets."""
    assigned, centroids = ivf_index(
        df, vec_col, id_col, nlist=nlist, seed=seed,
        sample_fraction=sample_fraction, max_iter=max_iter,
    )
    qvec = np.asarray(query, dtype=float)
    order = np.argsort(((centroids - qvec) ** 2).sum(axis=1))
    probe = [int(i) for i in order[:nprobe]]
    q = F.transform(vec_lit(query), lambda x: x.cast("double"))
    sim = cosine(F.col("v"), q)
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .select(F.col("id").alias(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


class IvfIndex:
    """Persisted IVF index: build ONCE (inverted lists written partitioned
    by ``list_id``, centroids as JSON metadata), probe MANY times with
    partition-pruned scans.

    This is the production split of ``ivf_topk`` (which re-trains per
    call): at 100 TB the quantizer is fit on a sample, every vector is
    assigned and written out hive-partitioned by list, and each query then
    reads only ``nprobe``/``nlist`` of the data — the scan prunes whole
    list directories before any IO (PartitionFilters, not a post-scan
    filter)."""

    LISTS = "lists"
    META = "ivf_meta.json"

    def __init__(self, root: str):
        self.root = root

    # -- build --------------------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        root: str,
        nlist: int = 64,
        seed: int = 42,
        sample_fraction: float | None = None,
        max_iter: int = 5,
    ) -> "IvfIndex":
        import json
        import os

        assigned, centroids = ivf_index(
            df, vec_col, id_col, nlist=nlist, seed=seed,
            sample_fraction=sample_fraction, max_iter=max_iter,
        )
        (
            # align the shuffle with the layout: one task per list → ~1
            # file per list directory
            assigned.repartition(nlist, "list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(os.path.join(root, cls.LISTS))
        )
        with open(os.path.join(root, cls.META), "w") as f:
            json.dump(
                {"nlist": nlist, "centroids": centroids.tolist()}, f
            )
        return cls(root)

    # -- probe --------------------------------------------------------------

    def _centroids(self) -> np.ndarray:
        import json
        import os

        with open(os.path.join(self.root, self.META)) as f:
            return np.asarray(json.load(f)["centroids"], dtype=float)

    def probe_lists(self, query: Sequence[float], nprobe: int) -> list[int]:
        centroids = self._centroids()
        qvec = np.asarray(query, dtype=float)
        order = np.argsort(((centroids - qvec) ** 2).sum(axis=1))
        return [int(i) for i in order[:nprobe]]

    def probe(
        self,
        spark,
        query: Sequence[float],
        k: int = 10,
        nprobe: int = 8,
    ) -> DataFrame:
        """Partition-pruned top-k: scans only the nprobe nearest lists."""
        import os

        lists = self.probe_lists(query, nprobe)
        scan = spark.read.parquet(os.path.join(self.root, self.LISTS))
        q = F.transform(vec_lit(query), lambda x: x.cast("double"))
        sim = cosine(F.col("v"), q)
        return (
            scan.filter(F.col("list_id").isin(lists))
            .select(F.col("id").alias("vec_id"), sim.alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
            .limit(k)
        )


class LshIndex:
    """Persisted sign-LSH index: signatures materialized as a partition
    column (the scale note on ``lsh_ann_topk`` made real). Build writes
    vectors hive-partitioned by ``sig``; probe reads exactly one bucket
    directory. Planes are re-derived from (dim, bits, seed) — no stored
    model state beyond three ints."""

    BUCKETS = "buckets"
    META = "lsh_meta.json"

    def __init__(self, root: str):
        self.root = root

    @classmethod
    def build(
        cls,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        root: str,
        dim: int,
        bits: int = 8,
        seed: int = 42,
    ) -> "LshIndex":
        import json
        import os

        planes = hyperplanes(dim, bits, seed)
        v = as_double_array(vec_col)
        base = df.select(
            F.col(id_col).alias("id"),
            v.alias("v"),
            _sign_signature(v, planes).alias("sig"),
        )
        (
            base.repartition(2**bits, "sig")
            .write.mode("overwrite")
            .partitionBy("sig")
            .parquet(os.path.join(root, cls.BUCKETS))
        )
        with open(os.path.join(root, cls.META), "w") as f:
            json.dump({"dim": dim, "bits": bits, "seed": seed}, f)
        return cls(root)

    def probe(
        self, spark, query: Sequence[float], k: int = 10
    ) -> DataFrame:
        import json
        import os

        with open(os.path.join(self.root, self.META)) as f:
            meta = json.load(f)
        planes = hyperplanes(meta["dim"], meta["bits"], meta["seed"])
        qvec = np.asarray(query, dtype=float)
        qsig = sum(
            (1 << i)
            for i, p in enumerate(planes)
            if float(np.dot(qvec, p)) >= 0
        )
        scan = spark.read.parquet(os.path.join(self.root, self.BUCKETS))
        q = F.transform(vec_lit(query), lambda x: x.cast("double"))
        sim = cosine(F.col("v"), q)
        return (
            scan.filter(F.col("sig") == qsig)
            .select(F.col("id").alias("vec_id"), sim.alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
            .limit(k)
        )


def pandas_cosine(query: Sequence[float]):
    """Arrow-vectorized cosine-to-query as a Pandas UDF (the fast Python
    path when the expression evaluator loses to numpy on wide vectors)."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def _cos(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        return pd.Series(
            (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        )

    return _cos


def pandas_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    sim = pandas_cosine(query)(F.col(vec_col))
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )
