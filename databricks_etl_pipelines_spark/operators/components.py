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


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every vertex in ``pairs``; cluster_id is the
    minimum id reachable through pair edges. Raises if not converged
    within ``max_iter`` rounds (pathological diameter — raise the bound)."""
    # Both edge directions from ONE scan of the pairs plan: pair
    # generation (LSH or PPJoin) is by far the most expensive input here,
    # and a union of fwd + reversed-fwd would execute that uncached plan
    # TWICE before the persist materializes (measured 2x the whole pair
    # cost at sf0.1). Explode keeps it a single pass.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
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
            return labels.select("id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise RuntimeError(
        f"connected components did not converge in {max_iter} rounds; "
        "increase max_iter for very long duplicate chains"
    )
