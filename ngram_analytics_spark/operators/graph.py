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
    # materialize the input once BEFORE the symmetrizing union: its two
    # branches would otherwise each re-execute the edge source (for
    # dedup composites that source is the similarity GEMM kernel)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
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


def knn_graph_edges(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    min_cos: float = 0.2,
    dim: int = 64,
) -> DataFrame:
    """Directed k-nearest-neighbor graph over an embedding corpus:
    for every vector, edges to its top-``k`` cosine neighbors at or
    above ``min_cos`` — the similarity graph that feeds graph-side
    corpus analytics (hub detection, quality propagation, clustering).

    Built from :func:`~ngram_analytics_spark.operators.similarity.
    cosine_edges` (auto-dispatched exact block-GEMM / LSH — the 100 TB
    path engages above the corpus-size bound), symmetrized, then
    ranked per source with a window keyed on the source node (one
    shuffle; ties broken on the 4-dp-rounded cosine by neighbor id so
    the edge set is engine-stable). A node whose k-th neighbor falls
    below ``min_cos`` keeps fewer than k edges.

    Returns (src, dst, c) with c the 4-dp-rounded cosine.
    """
    from pyspark.sql.window import Window as W

    from ngram_analytics_spark.operators.similarity import cosine_edges

    # The symmetrizing union below references the pair subtree twice,
    # and Catalyst executes the (expensive) similarity kernel once per
    # branch — materialize it once instead (eager localCheckpoint):
    # 2 kernel executions -> 1 for every consumer of the kNN graph.
    # dim reaches the LSH branch's banding guard (r8): RDD-backed
    # frames have unknown plan stats and route to LSH, where off-dim
    # vectors are EXCLUDED from banding rather than NULL-collapsed
    pairs = cosine_edges(
        corpus, id_col, vec_col, min_cos=min_cos, dim=dim
    ).localCheckpoint(eager=True)
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"),
        F.col("cos_sim").alias("c"),
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"),
            F.col("cos_sim").alias("c"),
        )
    )
    w = W.partitionBy("src").orderBy(F.col("c").desc(), F.col("dst").asc())
    return (
        directed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "vec_id",
    iters: int = 5,
    base: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank in pure int64 arithmetic: ranks held in
    integer micro-units, contributions as exact integer division by
    out-degree, damping 0.85 as ``(85 * s) div 100`` — every operation
    associative/exact, so results are bit-identical on any engine and
    any partitioning (float PageRank cannot be differentially hashed:
    summation order changes the last ulp).

    Per iteration: one join of ranks to edges on the source key (both
    sides hash-partitioned on the node id — co-partitioned after the
    first exchange) and one map-side-combinable sum on the destination
    key. Dangling nodes keep the damping floor and contribute nothing
    (mass leaks, as in the simplified formulation). The plan is built
    by unrolling ``iters`` joins — no action per round, Catalyst sees
    the whole pipeline.

    Returns (node, rank) for every node in ``nodes``.

    The edge frame is materialized ONCE up front (eager
    ``localCheckpoint``, the connected_components discipline): the
    unrolled plan references the edge subtree in every iteration plus
    the degree aggregate, and Catalyst does not reuse exchanges across
    those branches — with a similarity-kernel edge source (the 3-NN
    GEMM) the un-checkpointed plan executed that kernel 20 times
    (measured: q_graph_pagerank 3.0 s warm -> 0.9 s with the pin at
    sf0.1).
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src")
    n = nodes.select(F.col(node_col).alias("node"))
    ranks = n.select("node", F.lit(base).cast("long").alias("r"))
    floor_ = int(base * 15) // 100
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            n.join(contrib, n["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(floor_)
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))


def hits_int(edges: DataFrame) -> DataFrame:
    """Two unrolled HITS iterations (Kleinberg's hubs & authorities)
    in pure int64 arithmetic over a directed edge list ``(src, dst)``.

    With the all-ones hub start h0 = 1:

      auth1(v) = sum over u->v of h0(u)   (the in-degree),
      hub1(u)  = sum over u->v of auth1(v),
      auth2(v) = sum over u->v of hub1(u).

    Every score is an exact integer sum — no normalization inside the
    iteration (HITS rankings are scale-invariant, and skipping the
    float L2 normalization is what keeps the result bit-identical on
    any engine/partitioning; the caller ranks, it never compares
    across graphs). Bounds: auth2 <= in_deg * max hub1 <= k^2 * N^2 —
    int64-safe past 1e9 nodes at k = 3.

    Returns one row per node that holds an authority score after two
    rounds (i.e. every edge destination), with hub1 of that node
    coalesced to 0 when it has no out-edges.

    Plan: three keyed join+agg passes over the EDGE table (k*N rows —
    the post-kernel similarity graph, never the fact table); no
    driver round-trips, no floats.
    """
    a1 = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("auth1")
    )
    h1 = (
        edges.join(a1, edges.dst == a1.node)
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("auth1").cast("long").alias("hub1"))
    )
    a2 = (
        edges.join(h1, edges.src == h1.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("hub1").cast("long").alias("auth2"))
    )
    return (
        a2.join(a1, "node")
        .join(h1, "node", "left")
        .select(
            "node",
            "auth1",
            F.coalesce("hub1", F.lit(0)).cast("long").alias("hub1"),
            "auth2",
        )
    )
