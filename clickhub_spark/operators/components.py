"""Connected components over near-duplicate candidate pairs — the
step that turns pairwise dedup output into droppable duplicate GROUPS
(each component keeps one canonical doc; SURVEY §2.J5 completes here).

Algorithm: iterative min-label propagation (the standard large-graph
connected-components on Spark — e.g. the Hash-to-Min formulation):
every node starts labeled with its own id; each round, a node adopts
the minimum label among itself and its neighbors; converged when no
label changes.  Rounds are O(graph diameter) — near-dup graphs are
overwhelmingly tiny star/clique clusters, so 2-4 rounds in practice.

Scale notes: each round is one join + one aggregate on (node, label)
— all shuffles on node id; no driver-side graph state (the driver
only sees the one-number convergence check per round).  The round
DataFrames are checkpoint-truncated via localCheckpoint to keep the
lineage from growing unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    from pyspark.sql import Observation

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # carry the previous label through the round and OBSERVE the
        # change count inside the checkpoint's own materialization job
        # — one Spark job per round, not checkpoint + count
        obs = Observation()
        with_old = (
            labels.withColumnRenamed("comp", "__old")
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("__old"), F.coalesce(F.col("nbr_comp"), F.col("__old"))
                ).alias("comp"),
                "__old",
            )
            .observe(obs, F.sum((F.col("comp") != F.col("__old")).cast("long")).alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        labels.unpersist()  # release the previous round's checkpoint
        labels = with_old.drop("__old")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("node", "comp")


def dedup_groups(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Duplicate groups from candidate pairs: (component, n_members,
    canonical_id = min member) — drop everything whose id != canonical."""
    cc = connected_components(pairs, src, dst)
    return cc.groupBy(F.col("comp").alias("component")).agg(
        F.count("*").alias("n_members"),
        F.min("node").alias("canonical_id"),
    )
