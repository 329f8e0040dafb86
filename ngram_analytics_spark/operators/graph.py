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

    Two phases behind one API:

    1. Hash-min label propagation for the first ``max_iter // 2``
       rounds — one co-partitioned join + min-agg per round, converges
       in diameter rounds, which is a few hops for the dense clumps
       near-dup graphs are made of.
    2. If the diameter defeats phase 1 (adversarial duplicate CHAINS —
       e.g. each doc near-dups only its neighbor), fall back to
       large-star/small-star contraction (Kiveris et al., SOCC'14) for
       the remaining rounds: chains collapse in O(log^2 n) rounds
       instead of O(n), each round the same join + min-agg shape.

    Raises RuntimeError only if BOTH phases exhaust ``max_iter``.
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
    hashmin_rounds = max(1, max_iter // 2)
    for _ in range(hashmin_rounds):
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
    return _star_contraction(sym, max_iter - hashmin_rounds)


def _star_contraction(sym: DataFrame, max_rounds: int) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC'14) until the edge set is
    a fixpoint — a forest of stars, each centered at its component's
    minimum node id.

    Edge list is kept canonical larger-first (u > v). Per round:

    - large-star: for every node n, emit (v, m) for each STRICTLY
      LARGER neighbor v, where m = min(neighborhood of n, n) — larger
      neighbors re-attach to the local minimum (chains fold toward
      minima from every node at once, which is what beats hash-min's
      one-hop-per-round on long chains).
    - small-star: on the larger-first list grouped by the larger
      endpoint u with m = min(smaller neighbors), emit (v, m) for every
      smaller neighbor v plus (u, m) — u and its smaller neighbors
      collapse onto their minimum.

    Both operators preserve connectivity and never raise the minimum,
    so the fixpoint stars are centered at true component minima. Each
    round is two join + min-agg + distinct passes and ONE driver action
    (a (count, hash-sum) signature for the convergence test).
    """
    edges = (
        sym.filter(F.col("u") > F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    prev_sig = None
    for _ in range(max_rounds):
        # -- large-star ------------------------------------------------
        s = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            s.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m"))
        )
        large = (
            s.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star (input is larger-first by construction) --------
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("_su"), F.col("m").alias("_sv"))
            .union(
                mins2.select(
                    F.col("u").alias("_su"), F.col("m").alias("_sv")
                )
            )
            .filter(F.col("_su") != F.col("_sv"))
            .select(F.col("_su").alias("u"), F.col("_sv").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # (count, xor-of-hashes) set signature: order-insensitive and,
        # unlike a sum, cannot overflow under ANSI arithmetic.
        sig = small.agg(
            F.count("*"), F.bit_xor(F.xxhash64("u", "v"))
        ).collect()[0]
        edges = small
        if prev_sig is not None and tuple(sig) == prev_sig:
            centers = edges.select(F.col("v").alias("node"), F.col("v").alias("lbl"))
            members = edges.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
            labels = centers.union(members).groupBy("node").agg(
                F.min("lbl").alias("lbl")
            )
            # re-attach any node whose component collapsed entirely
            # (it is its own center and lost all edges)
            return (
                nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("lbl", F.col("node")).alias("cluster_id"),
                )
            )
        prev_sig = tuple(sig)
    raise RuntimeError(
        f"star contraction did not converge in {max_rounds} rounds"
    )
