"""Distributed connected components over near-duplicate pair edges.

The one-pass curation heuristic (drop the greater id of every verified
pair) keeps exactly one doc per duplicate *cluster* only when every
non-minimum member pairs directly with a smaller member. Long sparse
chains (a~b, b~c, c~d with a~d below threshold) need real connected
components: this module runs iterative min-label propagation — each round
every vertex takes the minimum label among itself and its neighbors —
which converges to the per-component minimum id in O(component diameter)
rounds. Near-dup components at threshold ≥0.7 have tiny diameters, so 3-5
rounds is typical; ``max_iter`` bounds the worst case.

Scale shape per round: one equi-join (labels ⋈ edges on vertex) + one
groupBy-min — both key-hash shuffles, no driver materialization beyond the
single convergence counter. Lineage is cut every round with
``localCheckpoint`` so the plan doesn't grow with iterations (the classic
iterative-Spark trap). Label-propagation CC in MapReduce/Spark: Kiveris et
al., "Connected Components in MapReduce and Beyond" (SoCC 2014) — this is
the basic hash-min variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


COLLECT_PAIR_THRESHOLD = 4_000_000


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    collect_threshold: int = COLLECT_PAIR_THRESHOLD,
) -> DataFrame:
    """(id, cluster_id) for every vertex in ``pairs``; cluster_id is the
    minimum id reachable through pair edges. Raises if not converged
    within ``max_iter`` rounds (pathological diameter — raise the bound).

    Size-adaptive execution (r15): the pair relation is materialized once
    (persist + count — pair generation is by far the most expensive input,
    and every strategy needs it exactly once). When the count is within
    ``collect_threshold`` the component labels are computed with a single
    driver-side union-find over the collected edges: near-dup edges are a
    vanishing fraction of the corpus, and at 4M pairs the collect is
    ~64 MB of longs while the distributed hash-min loop pays
    2 actions × O(diameter) rounds of scheduler overhead to label the
    same graph (measured 5-6 s for 256 edges at sf0.1 vs ~0.1 s
    collected). Beyond the threshold — edge sets too big to hold on the
    driver — the original O(diameter)-round distributed hash-min loop
    runs unchanged, so the 100 TB path is intact and the two paths are
    pinned equal by tests/test_curation.py. The threshold is a parameter,
    not a constant tuned to this box: callers with bigger drivers raise
    it, clusters with thin drivers lower it."""
    sel = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).persist()
    n_pairs = sel.count()
    if n_pairs <= collect_threshold:
        try:
            return _collected_clusters(sel)
        finally:
            sel.unpersist()
    # Both edge directions from ONE scan of the pairs plan: pair
    # generation (LSH or PPJoin) is by far the most expensive input here,
    # and a union of fwd + reversed-fwd would execute that uncached plan
    # TWICE before the persist materializes (measured 2x the whole pair
    # cost at sf0.1). Explode keeps it a single pass.
    edges = (
        sel.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("src"), F.col("b").alias("dst")
                    ),
                    F.struct(
                        F.col("b").alias("src"), F.col("a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                labels["id"],
                F.least(labels["label"], F.col("nlabel")).alias("label"),
                (F.col("nlabel") < labels["label"]).alias("changed"),
            )
            .localCheckpoint()  # cut lineage: plan stays O(1) per round
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            edges.unpersist()
            sel.unpersist()
            return labels.select("id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    sel.unpersist()
    raise RuntimeError(
        f"connected components did not converge in {max_iter} rounds; "
        "increase max_iter for very long duplicate chains"
    )


def _collected_clusters(sel: DataFrame) -> DataFrame:
    """Driver-side union-find over a bounded, already-materialized pair
    relation; returns the same (id, cluster_id = min reachable id)
    relation as the distributed hash-min loop. Path-halving union-find is
    O(E·α(V)) — microseconds per edge — and the result is a pure function
    of the edge SET, so partition layout and collect order cannot change
    it (min is order-insensitive)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in sel.collect():
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    # label every vertex with the MIN id of its component (the hash-min
    # fixpoint), independent of union order
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        m = comp_min.get(r)
        if m is None or v < m:
            comp_min[r] = v
    from pyspark.sql import types as T

    id_type = sel.schema[0].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type, False),
            T.StructField("cluster_id", id_type, False),
        ]
    )
    rows = [(v, comp_min[find(v)]) for v in parent]
    return sel.sparkSession.createDataFrame(rows, schema)


def pagerank_deterministic(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale_bits: int = 20,
    damping_pct: int = 85,
) -> DataFrame:
    """Power-iteration PageRank whose ENTIRE trajectory is bit-replayable
    in ANSI SQL — the k-means integer-lattice discipline applied to the
    second classic iterative algorithm. Every quantity is an INTEGER:
    ranks live on the 2^-scale_bits lattice (init: every node carries
    mass S = 2^scale_bits), each edge contribution is ONE integer
    division ``(damping · r(u)) DIV (100 · deg(u))`` (Spark ``DIV`` ==
    DuckDB ``//`` on positive BIGINTs — float division would lose
    precision past 2^53, integer division is exact at any magnitude),
    and the per-node sum commutes. The teleport term is the constant
    ``(100 − damping) · S DIV 100``. Truncation loses < 1 lattice unit
    per edge per round — the same bounded quantization error as the
    k-means centroid lattice, identical on both engines by construction.

    Int64 headroom: Σ ranks ≈ N·S, so a node's in-sum is < damping·N·S;
    at S = 2^20 that allows N ~ 2^40 nodes — any real graph.

    Scale shape per iteration: one equi-join of the rank relation onto
    edges (shuffle on src) + one groupBy(dst) integer sum (map-side
    combined) + a join back onto the node set for the teleport floor —
    constant plan size per round (ranks re-derive from the node
    relation each round, no lineage growth). ``edges`` must contain
    BOTH directions for an undirected walk; every node must appear as a
    src (no dangling handling — true here because edges are symmetric).
    That precondition is ENFORCED, not assumed: the node set derives
    from src, so a dst-only node (an asymmetric / directed edge list)
    would silently lose the mass routed to it — the groupBy(dst) in-sum
    exists but the left join back onto the src-derived node relation
    drops it, producing plausible wrong ranks. One bounded anti-join
    count over the distinct-node relations (node-set-sized, not
    edge-sized) turns that into a loud ValueError.

    Returns (node, r_int, rank) — the lattice integer and its float
    readout r_int / S."""
    S = 1 << scale_bits
    base = ((100 - damping_pct) * S) // 100
    nodes = edges.select(F.col(src).alias("node")).distinct()
    n_dangling = (
        edges.select(F.col(dst).alias("node"))
        .distinct()
        .join(nodes, "node", "left_anti")
        .count()
    )
    if n_dangling:
        raise ValueError(
            f"pagerank_deterministic: {n_dangling} node(s) appear as "
            f"{dst!r} but never as {src!r} — rank mass routed to them "
            "would vanish. Pass a symmetric edge list (both directions "
            "of every edge) or add explicit dangling-node self-loops."
        )
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    ranks = nodes.select("node", F.lit(S).cast("long").alias("r_int"))
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.withColumnRenamed("node", src), src
            )
            .join(deg, src)
            .select(
                F.col(dst).alias("node"),
                F.expr(
                    f"({damping_pct} * r_int) DIV (100 * deg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.coalesce(F.col("in_sum"), F.lit(0))
            ).alias("r_int"),
        )
    return ranks.select(
        "node",
        "r_int",
        (F.col("r_int").cast("double") / F.lit(float(S))).alias("rank"),
    )
