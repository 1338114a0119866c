"""Distributed connected components for dedup clustering.

Pair generators (MinHash/SimHash/Jaccard/embedding near-dup) emit
*edges*; keeping one representative per duplicate *group* requires the
transitive closure — connected components over the pair graph.  The
reference has no graph step (its dedup is single-key, priority dedup at
``/root/reference/etl_cid10.py:183-184``); this is the north-star
extension that turns pairwise near-dup output into actionable clusters.

Algorithm: iterative min-label propagation.  Every node starts labeled
with itself; each round it adopts the minimum label among itself and
its neighbors; at fixpoint every node carries the minimum node id of
its component.  Rounds needed = graph diameter — near-dup components
are small and dense (dups of the same source), so this converges in a
handful of rounds.  Each round is one shuffle (edge-label join +
min-aggregate); lineage is truncated every round with
``localCheckpoint`` so the plan does not grow exponentially.  For
adversarial long-chain graphs at 100 TB, switch to the large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — same join-aggregate primitive,
O(log² n) rounds; the propagation loop below is the right trade for
dup-cluster topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve the pair graph to ``(node, cluster_id)``.

    ``cluster_id`` is the minimum node id in the node's component —
    deterministic, join-able back onto the corpus to pick survivors
    (e.g. keep ``doc_id == cluster_id``).  Only nodes that appear in at
    least one edge are returned; singletons are trivially their own
    cluster and need no shuffle.

    Each iteration: symmetric edge join against current labels, min
    per node, compare-and-converge.  The convergence check is one
    cheap count on the changed set (labels only ever decrease, so
    "no label decreased" == fixpoint).
    """
    # Materialize the (possibly expensive) pair plan ONCE — the
    # symmetric union below references it twice, and every round joins
    # against it.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # One shuffle job per round: the decreased? flag rides along in
        # the checkpoint so convergence costs a local scan, not a join.
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("__dec"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("__dec")).count()
        labels = new_labels.drop("__dec")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))
