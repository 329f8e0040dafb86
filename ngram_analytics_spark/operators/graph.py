"""Iterative graph operators for dedup clustering.

Near-duplicate detection produces PAIRS (minhash/simhash/embedding
candidates), but a training-data pipeline needs CLUSTERS: if A~B and
B~C, all three are one duplicate group even when A~C is below
threshold. That closure is connected components — the one operator in
the dedup family that is inherently iterative, so it cannot be a
single Catalyst plan; it is a driver-side loop of DataFrame steps with
per-iteration lineage truncation.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round every node takes the min label among itself and
its neighbors; fixpoint = components labeled by their min member id.
Rounds needed = graph diameter. Near-dup graphs are unions of small
dense clumps (diameter is a few hops), so convergence is fast; for
adversarial long-chain graphs at 100 TB scale, the same loop body
accepts the large-star/small-star rewiring (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14), which contracts chains
in O(log^2 n) rounds — the per-round join/groupBy shape is identical.

Scale design per round: one shuffle join (labels x edges, both
hash-partitioned on the node key — co-partitioned after round 1) and
one map-side-combinable min-aggregation. `localCheckpoint(eager=True)`
truncates lineage so round N's plan does not replay rounds 1..N-1, at
the cost of persisting one (node, lbl) pair per node — the same
pattern GraphX/GraphFrames uses.

No counterpart exists in the reference (its sole operator is the
n-gram transform, NGramTransform.java:95-134); this is north-star
surface (SURVEY.md §2.B, dedup family).
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
    """Label every node of the undirected graph with the minimum node
    id reachable from it (= its component id).

    Returns (node, cluster_id). Only nodes that appear in ``edges`` are
    labeled; callers wanting singleton clusters for isolated items can
    union them in with cluster_id = own id.

    Raises RuntimeError if the fixpoint is not reached in ``max_iter``
    rounds (diameter larger than max_iter — switch to star-contraction).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = sym.join(
            labels, sym["u"] == labels["node"]
        ).select(F.col("v").alias("node"), "lbl")
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
