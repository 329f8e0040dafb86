"""Similarity-graph analytics over the embedding k-NN graph: degree
distribution, triangle census, and integer PageRank.

A training-data pipeline that builds a near-duplicate / similarity
graph (operators.similarity.cosine_edges feeds dedup composites) can
also MINE that graph: hub vectors (high in-degree) flag over-
represented content, triangles measure local redundancy, PageRank
ranks vectors by semantic centrality for sampling. The reference
engine has no counterpart (its sole operator is the n-gram transform,
NGramTransform.java:95-134); this extends SURVEY.md §2.B's
LLM-pipeline family with the graph-side passes.

Substrate: the directed 3-NN graph over `embeddings` (top-3 cosine
neighbors at >= 0.2, ties broken deterministically — see
operators.graph.knn_graph_edges). The TPC-H-derived co-occurrence
graphs are complete at test scale (every supplier pair shares an
order), so the k-NN graph is the non-degenerate substrate; it is also
the one a real pipeline has already paid for.

Scale notes: edge generation auto-dispatches exact block-GEMM vs LSH
(the 100 TB path engages above the corpus bound); per-query shuffles
key on node ids (no global windows); triangle enumeration joins on the
shared vertex of id-ordered edges — the production refinement for
power-law graphs is degree-ordered orientation, which bounds the join
fan-out by arboricity instead of max degree (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ngram_analytics_spark.catalog import load
from ngram_analytics_spark.functions.deterministic import oracle_round4det
from ngram_analytics_spark.functions.vectors import oracle_cosine
from ngram_analytics_spark.operators.graph import (
    hits_int,
    knn_graph_edges,
    pagerank_int,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()

_K = 3
_MIN_COS = 0.2
_COS_AB = oracle_cosine("a.embedding", "b.embedding")

#: DuckDB twin of operators.graph.knn_graph_edges: all-pairs rounded
#: cosine, per-source rank on (c DESC, dst ASC), top-3. The Spark side
#: reaches the same edge set through cosine_edges' bucketed kernels.
_EDGES_CTE = f"""
    pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {oracle_round4det(_COS_AB)} AS c
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE {oracle_round4det(_COS_AB)} >= {_MIN_COS}
    ), e AS (
        SELECT src, dst, c FROM (
            SELECT src, dst, c,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY c DESC, dst ASC) AS rn
            FROM pairs
        ) WHERE rn <= {_K}
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return knn_graph_edges(emb, k=_K, min_cos=_MIN_COS)


@REG.register(
    "q_graph_degree",
    oracle=f"""
        WITH {_EDGES_CTE}, ind AS (
            SELECT n.vec_id, coalesce(d.ind, 0) AS in_degree
            FROM embeddings n
            LEFT JOIN (SELECT dst, count(*) AS ind FROM e GROUP BY dst) d
              ON n.vec_id = d.dst
        )
        SELECT in_degree, count(*) AS n_nodes
        FROM ind GROUP BY in_degree
    """,
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree distribution of the 3-NN graph (0-degree nodes
    included): the hub-detection histogram — a vector chosen as
    neighbor by many others marks an over-dense region of the corpus.

    Two map-side-combined aggs (per-node count, then histogram) plus
    one left join to re-attach never-chosen nodes; all keyed on node
    ids, no global ordering anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    ind = (
        emb.select("vec_id")
        .join(
            _edges(spark, sf_dir)
            .groupBy("dst")
            .agg(F.count("*").alias("ind")),
            F.col("vec_id") == F.col("dst"),
            "left",
        )
        .select(F.coalesce("ind", F.lit(0)).alias("in_degree"))
    )
    return ind.groupBy("in_degree").agg(F.count("*").alias("n_nodes"))


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-ordered (s1 < s2) distinct edge table of the symmetrized
    3-NN graph, eagerly checkpointed — the shared substrate of
    q_graph_triangles and q_graph_clustering_coeff (multiple plan
    branches consume it and would each re-run the 3-NN GEMM edge
    kernel otherwise)."""
    return (
        _edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("s1"),
            F.greatest("src", "dst").alias("s2"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _triangle_corners(u: DataFrame) -> DataFrame:
    """(a, b, c) triangle rows (a < b < c, each counted once) via the
    two hash equi-joins on shared vertices of the id-ordered edge
    table — the q_graph_triangles enumeration, shared with the
    clustering-coefficient census."""
    e1 = u.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = u.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = u.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"])


@REG.register(
    "q_graph_triangles",
    oracle=f"""
        WITH {_EDGES_CTE}, u AS (
            SELECT DISTINCT least(src, dst) AS s1, greatest(src, dst) AS s2
            FROM e
        ), tri AS (
            SELECT count(*) AS v FROM u e1
            JOIN u e2 ON e2.s1 = e1.s2
            JOIN u e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        )
        SELECT 'n_nodes' AS metric, count(*) AS value
        FROM (SELECT s1 AS n FROM u UNION SELECT s2 FROM u)
        UNION ALL SELECT 'n_edges', count(*) FROM u
        UNION ALL SELECT 'n_triangles', v FROM tri
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the symmetrized 3-NN graph: triangles =
    closed 2-paths over id-ordered edges (a<b<c counted once) — the
    local-redundancy measure (clustering coefficient numerator).

    The enumeration is two equi-joins on shared vertices of the
    id-ordered edge table — hash-joinable, no nested loop; the metric
    rows are unioned single-row aggregates (the q_funnel shape), so no
    1-row cross joins either. The id-ordered edge table is
    materialized once (eager localCheckpoint): four plan branches
    (nodes, e1, e2, e3) reference it and Catalyst would re-execute
    the 3-NN GEMM edge kernel in each."""
    u = _undirected_edges(spark, sf_dir)
    nodes = (
        u.select(F.col("s1").alias("n"))
        .union(u.select(F.col("s2").alias("n")))
        .distinct()
    )
    tri = _triangle_corners(u)

    def metric(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("value")).select(
            F.lit(label).alias("metric"), "value"
        )

    return (
        metric(nodes, "n_nodes")
        .unionAll(metric(u, "n_edges"))
        .unionAll(metric(tri, "n_triangles"))
    )


def _pagerank_oracle(iters: int = 5) -> str:
    sql = f"""
        WITH {_EDGES_CTE},
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        n AS (SELECT vec_id FROM embeddings),
        r0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS r FROM n)
    """
    for i in range(1, iters + 1):
        sql += f"""
        , r{i} AS (
            SELECT n.vec_id,
                   CAST(150000 + (85 * coalesce(c.s, 0)) // 100
                        AS BIGINT) AS r
            FROM n LEFT JOIN (
                SELECT e.dst, sum(r.r // d.deg) AS s
                FROM e
                JOIN r{i - 1} r ON e.src = r.vec_id
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst
            ) c ON n.vec_id = c.dst)
        """
    return sql + f" SELECT vec_id AS node, r AS rank FROM r{iters}"


@REG.register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five power-iterations of PageRank over the 3-NN graph in exact
    int64 micro-units (operators.graph.pagerank_int): semantic
    centrality for sampling weights, with bit-identical results on any
    engine/partitioning — the reason for integer arithmetic is that a
    float PageRank's last ulp depends on summation order and cannot be
    differentially certified.

    The oracle unrolls the same five iterations as chained CTEs with
    the identical integer expressions ((85 * s) div 100 damping,
    rank div degree contributions)."""
    emb = load(spark, sf_dir, "embeddings")
    return pagerank_int(
        emb.select("vec_id"), _edges(spark, sf_dir), iters=5
    ).select(F.col("node"), F.col("rank"))


_LP_ROUNDS = 3


def _label_prop_oracle() -> str:
    """Chained-CTE unroll of synchronous min-tie majority label
    propagation (same constants as the Spark side)."""
    steps = []
    for r in range(1, _LP_ROUNDS + 1):
        steps.append(
            f"""cnt{r} AS (
            SELECT u.src AS node, l.lab, count(*) AS c
            FROM und u JOIN l{r - 1} l ON u.dst = l.node
            GROUP BY u.src, l.lab
        ), pick{r} AS (
            SELECT node, lab FROM (
                SELECT node, lab,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, lab ASC) AS rn
                FROM cnt{r}
            ) WHERE rn = 1
        ), l{r} AS (
            SELECT l.node, COALESCE(p.lab, l.lab) AS lab
            FROM l{r - 1} l LEFT JOIN pick{r} p ON l.node = p.node
        )"""
        )
    return f"""
        WITH {_EDGES_CTE.strip().rstrip()}, und AS (
            SELECT src, dst FROM e
            UNION
            SELECT dst, src FROM e
        ), l0 AS (
            SELECT vec_id AS node, CAST(label AS BIGINT) AS lab
            FROM embeddings
        ), {", ".join(steps)}
        SELECT l0.node, l0.lab AS label_init,
               l{_LP_ROUNDS}.lab AS label_final
        FROM l0 JOIN l{_LP_ROUNDS} ON l0.node = l{_LP_ROUNDS}.node
    """


@REG.register("q_graph_label_prop", oracle=_label_prop_oracle())
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community / label propagation over the 3-NN similarity graph:
    three synchronous rounds where every node adopts the MAJORITY
    label among its (undirected) neighbors, ties broken by smallest
    label, isolated nodes keeping their own — the semi-supervised
    label-spreading pass a pipeline uses to extend sparse quality or
    domain annotations across a near-duplicate graph. Entirely
    integer-valued, so results are bit-identical on any engine or
    partitioning (the pagerank discipline).

    Plan: the undirected edge set derives once from the
    checkpoint-backed kNN kernel (union of both directions +
    distinct); per round ONE join of edges to current labels on the
    neighbor key and one (node, label) count — the majority pick is
    max(struct(count, -label)), an ordinary map-side-combinable
    aggregate equivalent to the oracle's (c DESC, lab ASC) first-row
    window but with constant-size state instead of a per-node sort.
    Three rounds = the pagerank unroll shape: 2 shuffles per round,
    labels never leave the cluster.

    Materialization discipline (the operators/graph.py connected-
    components lesson): each round's label table is referenced TWICE
    by the next round (majority count + keep-own fallback join), so
    an unmaterialized lineage doubles per round — 2^rounds
    re-executions; eager localCheckpoint on the per-round labels and
    the undirected edge set caps the plan at one execution per
    round. The sf1 scale ratio (8.2x, BASELINE.md) is the shared
    exact kNN kernel growing quadratically by design below the LSH
    dispatch bound, not the propagation rounds."""
    emb = load(spark, sf_dir, "embeddings")
    e = _edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = emb.select(
        F.col("vec_id").alias("node"),
        F.col("label").cast("long").alias("lab"),
    )
    init = labels
    for _ in range(_LP_ROUNDS):
        cnt = (
            und.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("lab").alias("nlab")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), F.col("nlab"))
            .agg(F.count("*").alias("c"))
        )
        pick = cnt.groupBy("node").agg(
            F.max(
                F.struct(F.col("c"), (-F.col("nlab")).alias("neg"))
            ).alias("m")
        ).select("node", (-F.col("m.neg")).alias("plab"))
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node", F.coalesce("plab", "lab").alias("lab")
            )
            .localCheckpoint(eager=True)
        )
    return init.select(
        "node", F.col("lab").alias("label_init")
    ).join(
        labels.select("node", F.col("lab").alias("label_final")), "node"
    )


_JN_TOPK = 25


@REG.register(
    "q_graph_jaccard_nbrs",
    oracle=f"""
        WITH {_EDGES_CTE}, u AS (
            SELECT DISTINCT least(src, dst) AS s1, greatest(src, dst) AS s2
            FROM e
        ), adj AS (
            SELECT s1 AS node, s2 AS nbr FROM u
            UNION ALL
            SELECT s2 AS node, s1 AS nbr FROM u
        ), deg AS (
            SELECT node, count(*) AS d FROM adj GROUP BY node
        ), common AS (
            SELECT x.node AS a, y.node AS b, count(*) AS n_common
            FROM adj x JOIN adj y
              ON x.nbr = y.nbr AND x.node < y.node
            GROUP BY x.node, y.node
        ), scored AS (
            SELECT c.a, c.b, c.n_common, da.d AS deg_a, db.d AS deg_b,
                   CAST(floor(c.n_common * 1000000.0
                              / (da.d + db.d - c.n_common)) AS BIGINT)
                       AS jaccard_ppm
            FROM common c
            JOIN deg da ON c.a = da.node
            JOIN deg db ON c.b = db.node
        )
        SELECT a, b, n_common, deg_a, deg_b, jaccard_ppm
        FROM scored
        ORDER BY jaccard_ppm DESC, a ASC, b ASC
        LIMIT {_JN_TOPK}
    """,
)
def q_graph_jaccard_nbrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity over the undirected 3-NN graph
    (link prediction / redundancy mining): node pairs sharing at least
    one neighbor score |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — high scorers
    are structurally interchangeable vectors (same semantic
    neighborhood) even when the pair itself is not an edge; top-{_JN_TOPK}
    reported with full tiebreak (score DESC, then ids).

    Plan: candidate pairs come from the WEDGE join (two adjacency
    copies joined on the shared neighbor, id-ordered to halve the
    output) — fan-out per node is bounded by the kNN degree (<= 2k
    undirected), NOT all-pairs; degrees attach by two keyed joins and
    the top-k is a TakeOrdered boundary, no global sort materialized.
    Integer floor-ppm scoring — no float surface."""
    e = _edges(spark, sf_dir)
    u = (
        e.select(
            F.least("src", "dst").alias("s1"),
            F.greatest("src", "dst").alias("s2"),
        )
        .distinct()
    )
    adj = u.select(
        F.col("s1").alias("node"), F.col("s2").alias("nbr")
    ).unionAll(u.select(F.col("s2").alias("node"), F.col("s1").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count("*").alias("d"))
    # distinct output names on each side: a same-named `nbr == nbr`
    # self-join predicate relies on Spark's fragile auto-disambiguation
    x = adj.select(F.col("node").alias("a"), "nbr")
    y = adj.select(F.col("node").alias("b"), F.col("nbr").alias("nbr_y"))
    common = (
        x.join(y, (F.col("nbr") == F.col("nbr_y")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    scored = (
        common.join(deg.select(F.col("node").alias("a"),
                               F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("d").alias("deg_b")), "b")
        .select(
            "a", "b", "n_common", "deg_a", "deg_b",
            F.floor(
                F.col("n_common").cast("double") * F.lit(1_000_000.0)
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common"))
                .cast("double")
            ).cast("long").alias("jaccard_ppm"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_JN_TOPK)


#: k-core parameters: core threshold and the UNROLLED peel rounds. The
#: round count is part of the operator contract (both engines peel
#: exactly _KC_R times and report convergence), which is what makes an
#: iterative fixpoint SQL-certifiable without recursive aggregation.
#: The graph is the MUTUAL 3-NN graph (edge kept iff each endpoint is
#: in the other's kNN list) — the plain symmetrized graph guarantees
#: degree >= 3 (its 3-core is everything and its 4-core cascades to
#: empty), while mutual degrees span 1..k and the 2-core is the
#: non-trivial "semantically reciprocated" cluster set.
_KC_K = 2
_KC_R = 6


def _kcore_round_sql(i: int) -> str:
    return f"""a{i} AS MATERIALIZED (
            SELECT node FROM (
                SELECT d.node, count(*) AS c
                FROM adj d
                JOIN a{i - 1} x ON d.node = x.node
                JOIN a{i - 1} y ON d.nbr = y.node
                GROUP BY d.node
            ) WHERE c >= {_KC_K}
        )"""


@REG.register(
    "q_graph_kcore",
    oracle=f"""
        WITH {_EDGES_CTE}, u AS MATERIALIZED (
            SELECT a.src AS s1, a.dst AS s2
            FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
            WHERE a.src < a.dst
        ), adj AS MATERIALIZED (
            SELECT s1 AS node, s2 AS nbr FROM u
            UNION ALL SELECT s2, s1 FROM u
        ), a0 AS MATERIALIZED (
            SELECT DISTINCT node FROM adj
        ), {", ".join(_kcore_round_sql(i) for i in range(1, _KC_R + 1))}
        SELECT 'k' AS metric, CAST({_KC_K} AS BIGINT) AS value
        UNION ALL SELECT 'core_nodes', count(*) FROM a{_KC_R}
        UNION ALL SELECT 'core_edges', count(*)
          FROM u JOIN a{_KC_R} x ON u.s1 = x.node
                 JOIN a{_KC_R} y ON u.s2 = y.node
        UNION ALL SELECT 'converged',
               CASE WHEN (SELECT count(*) FROM a{_KC_R})
                       = (SELECT count(*) FROM a{_KC_R - 1})
                    THEN 1 ELSE 0 END
    """,
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the MUTUAL 3-NN similarity graph by {r} UNROLLED
    peel rounds (drop nodes with < {k} reciprocated alive neighbors,
    repeat): the densest-region extractor — in an embedding corpus
    the surviving core marks semantically redundant clusters worth
    aggressive dedup/downsampling, where degree alone (q_graph_degree)
    over-counts hubs with weak neighborhoods. The convergence flag is
    honest: at {r} rounds this corpus is still shedding a node or two
    per round (the contract is "{r}-round peel + converged bit", not
    "the fixpoint").

    The fixed round count is the certification trick: a data-dependent
    fixpoint loop cannot be expressed in plain SQL, but k-core peeling
    converges geometrically, so both engines peel exactly {r} rounds
    and EMIT a convergence flag — the operator's contract is
    "{r}-round peel + converged bit", fully hash-certifiable (and the
    flag doubles as the fixpoint proof when 1).

    Plan: every round is (semi-filter both edge endpoints against the
    alive set) -> (node-keyed degree agg) -> (threshold filter) — all
    shuffles keyed on node id, alive sets shrink monotonically and
    broadcast. The edge list localCheckpoints once: 2*{r}+2 plan
    branches reference it and each would otherwise re-run the 3-NN
    GEMM kernel (q_graph_triangles precedent)."""
    ed = (
        _edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # referenced twice by the mutual join
    )
    u = (
        ed.alias("a")
        .join(
            ed.alias("b"),
            (F.col("a.src") == F.col("b.dst"))
            & (F.col("a.dst") == F.col("b.src")),
        )
        .filter(F.col("a.src") < F.col("a.dst"))
        .select(F.col("a.src").alias("s1"), F.col("a.dst").alias("s2"))
        .localCheckpoint(eager=True)
    )
    adj = u.select(F.col("s1").alias("node"), F.col("s2").alias("nbr")).union(
        u.select(F.col("s2").alias("node"), F.col("s1").alias("nbr"))
    )
    alive = adj.select("node").distinct().localCheckpoint(eager=True)
    prev_alive = alive
    for _ in range(_KC_R):
        prev_alive = alive
        deg = (
            adj.join(alive, "node", "semi")
            .join(
                alive.withColumnRenamed("node", "nbr"), "nbr", "semi"
            )
            .groupBy("node")
            .agg(F.count("*").alias("c"))
        )
        # each alive set is referenced by TWO semi-joins next round
        # plus the final census: without a per-round checkpoint the
        # lazy plan doubles every round (2^R replays of the early
        # rounds — measured 24.3 s -> ~1.5 s at sf0.1). The table is
        # node-id-sized; the label-prop per-round discipline applies.
        alive = (
            deg.filter(F.col("c") >= _KC_K)
            .select("node")
            .localCheckpoint(eager=True)
        )

    def metric(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("value")).select(
            F.lit(label).alias("metric"), "value"
        )

    core_edges = u.join(
        alive.withColumnRenamed("node", "s1"), "s1", "semi"
    ).join(alive.withColumnRenamed("node", "s2"), "s2", "semi")
    converged = (
        metric(alive, "x")
        .crossJoin(
            F.broadcast(
                prev_alive.agg(F.count("*").alias("prev_n"))
            )
        )
        .select(
            F.lit("converged").alias("metric"),
            F.when(F.col("value") == F.col("prev_n"), 1)
            .otherwise(0)
            .cast("long")
            .alias("value"),
        )
    )
    k_row = spark.range(1).select(
        F.lit("k").alias("metric"), F.lit(_KC_K).cast("long").alias("value")
    )
    return (
        k_row.unionAll(metric(alive, "core_nodes"))
        .unionAll(metric(core_edges, "core_edges"))
        .unionAll(converged)
    )


q_graph_kcore.__doc__ = q_graph_kcore.__doc__.format(k=_KC_K, r=_KC_R)


# ---------------------------------------------------------- unrolled BFS

#: BFS geometry: seeds = vec_id % _BFS_SEED_MOD == 0, _BFS_R unrolled
#: frontier-expansion rounds (the q_graph_kcore fixed-round
#: certification trick: a data-dependent fixpoint is not plain SQL,
#: but R rounds + an honest converged bit is).
_BFS_SEED_MOD = 50
_BFS_R = 4


def _bfs_round_sql(i: int) -> str:
    return f"""d{i} AS MATERIALIZED (
            SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM d{i - 1}
                UNION ALL
                SELECT a.nbr AS node, {i} AS dist
                FROM adj a JOIN d{i - 1} f
                  ON a.node = f.node AND f.dist = {i - 1}
            ) GROUP BY node
        )"""


@REG.register(
    "q_graph_bfs",
    oracle=f"""
        WITH {_EDGES_CTE}, adj AS MATERIALIZED (
            SELECT src AS node, dst AS nbr FROM e
            UNION
            SELECT dst, src FROM e
        ), d0 AS MATERIALIZED (
            SELECT vec_id AS node, 0 AS dist FROM embeddings
            WHERE vec_id % {_BFS_SEED_MOD} = 0
        ), {", ".join(_bfs_round_sql(i) for i in range(1, _BFS_R + 1))}
        SELECT 'dist_' || CAST(dist AS VARCHAR) AS metric,
               CAST(count(*) AS BIGINT) AS value
        FROM d{_BFS_R} GROUP BY dist
        UNION ALL
        SELECT 'unreached',
               (SELECT count(*) FROM embeddings)
               - (SELECT count(*) FROM d{_BFS_R})
        UNION ALL
        SELECT 'converged',
               CASE WHEN (SELECT count(*) FROM d{_BFS_R})
                       = (SELECT count(*) FROM d{_BFS_R - 1})
                    THEN 1 ELSE 0 END
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the symmetrized 3-NN similarity graph:
    {r} unrolled frontier-expansion rounds from the seed set
    (vec_id % {m} == 0), reporting the hop-distance histogram, the
    unreached count, and an honest convergence bit — the reachability
    primitive under influence/propagation analyses (how much of the
    corpus sits within k hops of a flagged cluster) that complements
    the dedup-side connected components (operators/graph.py).

    Plan: every round is (frontier semi-restricted adjacency join,
    keyed on node id) -> (node-keyed min-dist agg); the distance table
    grows monotonically and localCheckpoints per round (it is
    referenced by the expansion join AND the next union — the
    q_graph_kcore lazy-plan-doubling discipline). The edge list
    checkpoints once. At scale every shuffle keys on node id; frontier
    size is bounded by the reachable set, never all-pairs.

    Determinism: distances are exact integer mins; the fixed round
    count + converged flag make the fixpoint SQL-certifiable."""
    ed = _edges(spark, sf_dir).select("src", "dst").localCheckpoint(
        eager=True
    )
    adj = (
        ed.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .union(
            ed.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    emb = load(spark, sf_dir, "embeddings")
    d = emb.filter(F.col("vec_id") % _BFS_SEED_MOD == 0).select(
        F.col("vec_id").alias("node"), F.lit(0).alias("dist")
    )
    prev = d
    for i in range(1, _BFS_R + 1):
        prev = d
        frontier = d.filter(F.col("dist") == i - 1)
        expand = adj.join(frontier, "node").select(
            F.col("nbr").alias("node"), F.lit(i).alias("dist")
        )
        d = (
            d.unionByName(expand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    hist = (
        d.groupBy("dist")
        .agg(F.count("*").alias("value"))
        .select(
            F.concat(F.lit("dist_"), F.col("dist").cast("string")).alias(
                "metric"
            ),
            F.col("value").cast("long").alias("value"),
        )
    )
    unreached = (
        emb.agg(F.count("*").alias("n_total"))
        .crossJoin(F.broadcast(d.agg(F.count("*").alias("n_reached"))))
        .select(
            F.lit("unreached").alias("metric"),
            (F.col("n_total") - F.col("n_reached")).cast("long").alias(
                "value"
            ),
        )
    )
    converged = (
        d.agg(F.count("*").alias("n_now"))
        .crossJoin(F.broadcast(prev.agg(F.count("*").alias("n_prev"))))
        .select(
            F.lit("converged").alias("metric"),
            F.when(F.col("n_now") == F.col("n_prev"), 1)
            .otherwise(0)
            .cast("long")
            .alias("value"),
        )
    )
    return hist.unionAll(unreached).unionAll(converged)


q_graph_bfs.__doc__ = q_graph_bfs.__doc__.format(r=_BFS_R, m=_BFS_SEED_MOD)


# ------------------------------------- clustering coefficient

@REG.register(
    "q_graph_clustering_coeff",
    oracle=f"""
        WITH {_EDGES_CTE}, u AS (
            SELECT DISTINCT least(src, dst) AS s1,
                   greatest(src, dst) AS s2
            FROM e
        ), deg AS (
            SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT s1 AS n FROM u
                UNION ALL SELECT s2 FROM u
            ) GROUP BY n
        ), tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.c AS z FROM
                (SELECT s1 AS a, s2 AS b FROM u) e1
            JOIN (SELECT s1 AS b, s2 AS c FROM u) e2 USING (b)
            JOIN (SELECT s1 AS a, s2 AS c FROM u) e3 USING (a, c)
        ), ntri AS (
            SELECT n, CAST(count(*) AS BIGINT) AS t FROM (
                SELECT x AS n FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ) GROUP BY n
        ), loc AS (
            SELECT d.n, d.d, COALESCE(t.t, 0) AS t,
                   CASE WHEN d.d >= 2 THEN
                       COALESCE(t.t, 0) * 2000000 // (d.d * (d.d - 1))
                   END AS cc_ppm
            FROM deg d LEFT JOIN ntri t ON d.n = t.n
        )
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(count(cc_ppm) AS BIGINT) AS n_deg2,
               CAST(sum(CAST(d AS HUGEINT) * (d - 1)) // 2 AS BIGINT)
                   AS n_wedges,
               CAST(sum(t) // 3 AS BIGINT) AS n_triangles,
               CAST(sum(t) * 2000000
                    // sum(CAST(d AS HUGEINT) * (d - 1)) AS BIGINT)
                   AS transitivity_ppm,
               CAST(sum(cc_ppm) // count(cc_ppm) AS BIGINT)
                   AS avg_local_cc_ppm
        FROM loc
    """,
)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-coefficient census of the symmetrized 3-NN graph:
    global transitivity (3*triangles / wedges) AND the average local
    coefficient over deg>=2 nodes — the two standard cohesion
    statistics (they differ under degree skew, which is why both are
    reported), built from q_graph_triangles' closed-2-path machinery
    plus a per-NODE triangle count (each triangle credits all three
    corners).

    Determinism: wedges = sum d*(d-1) and per-corner triangle counts
    are exact integers; both coefficients are single integer `div`s —
    transitivity = 3T/wedges = sum(t)*2e6 div sum(d*(d-1)) (sum(t)
    counts each triangle at its 3 corners and sum(d*(d-1)) is twice
    the wedge count, so the 2e6 scale makes K3 read exactly 1e6 ppm),
    local cc in ppm = 2t*1e6 div d(d-1). sum(t) is divisible by 3 and
    sum(d*(d-1)) by 2 by construction, so the // casts are exact.
    Headroom: the wedge mass sum d(d-1) is QUADRATIC in hub degree
    (int64 wraps once any node tops ~3e9 neighbors, and the corpus
    sum wraps far earlier under skew), so the d*(d-1) and triangle
    accumulators ride DECIMAL(38,0)/HUGEINT (r12 lint-widening
    audit); the per-node t*2e6 term is int64-safe to d ~ 3e6.

    Plan: the id-ordered edge table materializes once (eager
    localCheckpoint — five consumers would each re-run the 3-NN GEMM
    kernel); triangles are the same two hash equi-joins as
    q_graph_triangles; everything after lives on the node domain
    (node-keyed aggs + one LEFT join). At 100 TB: edge-keyed shuffles
    only, never all-pairs."""
    u = _undirected_edges(spark, sf_dir)
    deg = (
        u.select(F.col("s1").alias("n"))
        .unionAll(u.select(F.col("s2").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    tri = _triangle_corners(u)
    # one pass over the triangle join: explode the three corners
    # instead of a triple union (three consumers would re-execute the
    # two-equi-join enumeration three times)
    ntri = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "n"
            )
        )
        .groupBy("n")
        .agg(F.count("*").alias("t"))
    )
    loc = deg.join(ntri, "n", "left").select(
        "d",
        F.coalesce("t", F.lit(0)).alias("t"),
        F.when(
            F.col("d") >= 2,
            F.expr("coalesce(t, 0) * 2000000 div (d * (d - 1))"),
        ).alias("cc_ppm"),
    )
    return loc.agg(
        F.count("*").alias("n_nodes"),
        F.count("cc_ppm").alias("n_deg2"),
        F.expr("sum(cast(d as decimal(38,0)) * (d - 1)) div 2")
        .cast("long")
        .alias("n_wedges"),
        F.expr("sum(cast(t as decimal(38,0))) div 3")
        .cast("long")
        .alias("n_triangles"),
        F.expr(
            "sum(cast(t as decimal(38,0))) * 2000000"
            " div sum(cast(d as decimal(38,0)) * (d - 1))"
        )
        .cast("long")
        .alias("transitivity_ppm"),
        F.expr("sum(cc_ppm) div count(cc_ppm)")
        .cast("long")
        .alias("avg_local_cc_ppm"),
    )


# ----------------------------------------------------- modularity

@REG.register(
    "q_graph_modularity",
    oracle=f"""
        WITH {_EDGES_CTE}, und AS (
            SELECT src, dst FROM e
            UNION
            SELECT dst AS src, src AS dst FROM e
        ), lab AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label
            FROM embeddings
        ), j AS (
            SELECT l1.label AS la, l2.label AS lb
            FROM und
            JOIN lab l1 ON und.src = l1.vec_id
            JOIN lab l2 ON und.dst = l2.vec_id
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS e FROM j
        ), per AS (
            SELECT la AS label,
                   CAST(count(*) AS BIGINT) AS deg,
                   CAST(count(*) FILTER (WHERE la = lb) AS BIGINT)
                       AS intra
            FROM j GROUP BY la
        ), dl AS (
            SELECT DISTINCT CAST(label AS BIGINT) AS label
            FROM embeddings
        )
        SELECT dl.label,
               CAST(coalesce(per.deg, 0) AS BIGINT) AS deg,
               CAST(coalesce(per.intra, 0) AS BIGINT) AS intra,
               CAST(floor(
                   (tot.e * coalesce(per.intra, 0)
                    - coalesce(per.deg, 0) * coalesce(per.deg, 0))
                   * 1000000.0 / (tot.e * tot.e)
               ) AS BIGINT) AS contrib_ppm
        FROM dl LEFT JOIN per ON dl.label = per.label
        CROSS JOIN tot
        ORDER BY dl.label
    """,
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LABEL partition over the undirected
    3-NN similarity graph, reported per community: intra-community
    edge count, degree mass, and the community's additive modularity
    contribution Q_c = e_c/m - (deg_c/2m)^2 in ppm — the number that
    says whether the corpus's class annotation aligns with its
    embedding-similarity structure (high Q: classes are tight
    embedding clusters; Q ~ 0: labels are noise w.r.t. geometry).
    Full Q is the column sum. Closed-form fixture pin: two
    disconnected 3-cliques with cluster-aligned labels give exactly
    Q = 0.5 (tests/test_statistic_fixtures.py — the r10 statistic-key
    convention).

    Exact arithmetic on the DIRECTED-double representation (E = 2m
    rows after symmetrizing): Q_c = (E*intra_c - deg_c^2) / E^2 where
    intra_c counts both directions — the integer numerator stays
    < 2^53 through the 1e6 scaling at any k-NN graph size with
    E < ~9.4e7 (k=3 doubles: ~15M vectors; beyond that, widen to
    DECIMAL on both engines), so the single floor() is the only
    float step and floors toward -inf identically on both engines
    (contributions CAN be negative).

    Plan: the undirected edge set derives once from the
    checkpoint-backed kNN kernel; two broadcast-label joins attach
    endpoint communities; ONE (label) groupBy + a 1-row total
    crossJoin — everything after the kernel lives on the label
    domain."""
    emb = load(spark, sf_dir, "embeddings")
    e = _edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    lab = emb.select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    j = (
        und.join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("src"),
                    F.col("label").alias("la"),
                )
            ),
            "src",
        )
        .join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("dst"),
                    F.col("label").alias("lb"),
                )
            ),
            "dst",
        )
        .select("la", "lb")
        .localCheckpoint(eager=True)
    )
    tot = j.agg(F.count("*").cast("long").alias("e"))
    per = j.groupBy(F.col("la").alias("label")).agg(
        F.count("*").cast("long").alias("deg"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("intra"),
    )
    dl = lab.select("label").distinct()
    out = (
        dl.join(per, "label", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("intra", F.lit(0)).cast("long").alias("intra"),
            F.floor(
                (
                    F.col("e") * F.coalesce("intra", F.lit(0))
                    - F.coalesce("deg", F.lit(0))
                    * F.coalesce("deg", F.lit(0))
                )
                * F.lit(1000000.0)
                / (F.col("e") * F.col("e"))
            )
            .cast("long")
            .alias("contrib_ppm"),
        )
        .orderBy("label")
    )
    return out


# -------------------------------------------------- assortativity

@REG.register(
    "q_graph_assortativity",
    oracle=f"""
        WITH {_EDGES_CTE}, und AS (
            SELECT src, dst FROM e
            UNION
            SELECT dst AS src, src AS dst FROM e
        ), deg AS (
            SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY src
        ), pts AS (
            SELECT da.d AS dx, db.d AS dy
            FROM und
            JOIN deg da ON und.src = da.node
            JOIN deg db ON und.dst = db.node
        ), s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN dx = dy THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_eq,
                   CAST(sum(dx) AS BIGINT) AS sx,
                   CAST(sum(dy) AS BIGINT) AS sy,
                   CAST(sum(dx * dy) AS BIGINT) AS sxy,
                   CAST(sum(dx * dx) AS BIGINT) AS sxx,
                   CAST(sum(dy * dy) AS BIGINT) AS syy
            FROM pts
        )
        SELECT n AS n_edges,
               n_eq AS n_equal_deg,
               CAST(floor(
                    (n * sxy - sx * sy) * 1000000.0
                    / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)),
                             0)
               ) AS BIGINT) AS assortativity_ppm
        FROM s
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected 3-NN similarity graph:
    the Pearson correlation of endpoint degrees over all (directed-
    double) edges — positive means hubs attach to hubs (an
    over-represented dense core in the corpus), negative a hub-and-
    spoke geometry; the one-number summary next to q_graph_degree's
    full histogram and q_graph_modularity's partition alignment.

    Determinism: degrees are exact integer counts, so the correlation
    is (n*Sxy - Sx*Sy) over sqrt(exact int) * sqrt(exact int) — two
    IEEE-correctly-rounded sqrts and one floor, the q_ml_mcc
    spelling. Closed-form fixture pin: a 3-clique plus a mutual pair
    has degree pairs perfectly correlated — the pin documents the
    one-ulp sqrt(12)*sqrt(12) = 11.999999999999998 artifact that
    floors to exactly 1000000 ppm (tests/test_statistic_fixtures.py).

    Plan: the undirected edge set derives once from the
    checkpoint-backed kNN kernel; ONE node-keyed degree agg joined
    to both endpoints (node-keyed shuffles); the correlation is a
    1-row aggregate with 6 integer sums. int64 headroom: sum(dx*dy)
    < 2^63 holds to ~3e9 edges at max degree 2k."""
    e = _edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    pts = (
        und.join(
            deg.select(F.col("node").alias("src"), F.col("d").alias("dx")),
            "src",
        )
        .join(
            deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")),
            "dst",
        )
        .select("dx", "dy")
    )
    s = pts.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.when(F.col("dx") == F.col("dy"), 1).otherwise(0))
        .cast("long")
        .alias("n_equal_deg"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    num = F.col("n_edges") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n_edges") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n_edges") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "n_edges",
        "n_equal_deg",
        F.floor(num * F.lit(1000000.0) / F.nullif(den, F.lit(0.0)))
        .cast("long")
        .alias("assortativity_ppm"),
    )


# ----------------------------------------------------------------HITS

_HITS_TOPK = 20


@REG.register(
    "q_graph_hits",
    oracle=f"""
        WITH {{edges}}, a1 AS (
            SELECT dst AS node, CAST(count(*) AS BIGINT) AS auth1
            FROM e GROUP BY dst
        ), h1 AS (
            SELECT e.src AS node, CAST(sum(a1.auth1) AS BIGINT) AS hub1
            FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src
        ), a2 AS (
            SELECT e.dst AS node, CAST(sum(h1.hub1) AS BIGINT) AS auth2
            FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst
        )
        SELECT a2.node AS vec_id, a2.auth2,
               a1.auth1,
               CAST(coalesce(h1.hub1, 0) AS BIGINT) AS hub1
        FROM a2 JOIN a1 ON a2.node = a1.node
        LEFT JOIN h1 ON a2.node = h1.node
        ORDER BY a2.auth2 DESC, a2.node ASC
        LIMIT {_HITS_TOPK}
    """.format(edges=_EDGES_CTE.strip()),
)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} authorities under two unrolled HITS iterations
    (operators.graph.hits_int) over the directed 3-NN graph: the
    mutual-reinforcement centrality (a vector is authoritative when
    hub-like vectors choose it; hub-like when it chooses
    authorities) — ranks over-represented corpus regions more sharply
    than raw in-degree (q_graph_degree) because second-round
    authority folds in WHO points at you, and complements PageRank's
    random-walk view with the bipartite-reinforcement one.

    Determinism: exact integer score sums, no normalization (HITS
    ranking is scale-invariant), ties broken by node id; the oracle
    unrolls the identical two rounds as chained CTEs.

    Plan: the shared kNN kernel builds the edge table once; HITS is
    three keyed join+agg passes over that k*N-row edge list and ONE
    TakeOrderedAndProject for the top-{k} — nothing fact-width after
    the kernel."""
    scores = hits_int(_edges(spark, sf_dir))
    return (
        scores.select(
            F.col("node").alias("vec_id"), "auth2", "auth1", "hub1"
        )
        .orderBy(F.col("auth2").desc(), F.col("vec_id").asc())
        .limit(_HITS_TOPK)
    )


q_graph_hits.__doc__ = q_graph_hits.__doc__.format(k=_HITS_TOPK)


# ------------------------------------------------------- reciprocity

@REG.register(
    "q_graph_reciprocity",
    oracle=f"""
        WITH {_EDGES_CTE}, m AS (
            SELECT CAST(count(*) AS BIGINT) AS n_recip
            FROM e a JOIN e b
              ON a.src = b.dst AND a.dst = b.src
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
        )
        SELECT n_edges,
               n_recip,
               CAST(n_recip / 2 AS BIGINT) AS n_mutual_pairs,
               CAST(n_recip * 1000000 // NULLIF(n_edges, 0) AS BIGINT)
                   AS reciprocity_ppm
        FROM tot CROSS JOIN m
    """,
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity of the 3-NN graph: the fraction of
    "a is a top-3 neighbor of b" edges where b is ALSO a top-3
    neighbor of a — the global mutuality dial that decides whether the
    mutual-kNN graph (q_graph_kcore's substrate) keeps enough edges to
    be useful, and a redundancy signal in its own right (reciprocated
    similarity = genuinely interchangeable vectors; one-way edges are
    hub attraction).

    Determinism: pure edge counts and one floor-div ppm.

    Plan: the kNN edge kernel (auto-dispatched GEMM/LSH) emits 3n
    edges; reciprocity is ONE self-equi-join on the reversed key pair
    (hash join on (src, dst) — fan-out 1, no residual) and two 1-row
    aggregates. At 100 TB the join is edge-set-sized, never
    corpus-sized."""
    e = _edges(spark, sf_dir).select("src", "dst")
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    n_recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count("*").cast("long").alias("n_recip"))
    )
    tot = e.agg(F.count("*").cast("long").alias("n_edges"))
    return tot.crossJoin(F.broadcast(n_recip)).select(
        "n_edges",
        "n_recip",
        F.expr("n_recip div 2").cast("long").alias("n_mutual_pairs"),
        # nullif: a 0-edge slice (empty corpus, empty-probe r11)
        # reads NULL instead of raising under ANSI division
        F.expr("n_recip * 1000000 div nullif(n_edges, 0)")
        .cast("long")
        .alias("reciprocity_ppm"),
    )


# ------------------------------------------------------ Adamic-Adar

_AA_TOPK = 20


@REG.register(
    "q_graph_adamic_adar",
    oracle=f"""
        WITH {_EDGES_CTE}, u AS (
            SELECT DISTINCT least(src, dst) AS s1,
                   greatest(src, dst) AS s2
            FROM e
        ), adj AS (
            SELECT s1 AS node, s2 AS nbr FROM u
            UNION ALL
            SELECT s2 AS node, s1 AS nbr FROM u
        ), deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY node
        ), wt AS (
            SELECT node, CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE))
                                    + 0.5) AS BIGINT) AS w_ppm
            FROM deg WHERE d >= 2
        ), wedges AS (
            SELECT x.node AS a, y.node AS b,
                   CAST(count(*) AS BIGINT) AS n_common,
                   CAST(sum(w.w_ppm) AS BIGINT) AS aa_ppm
            FROM adj x
            JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
            JOIN wt w ON w.node = x.nbr
            GROUP BY x.node, y.node
        ), nonedge AS (
            SELECT w.* FROM wedges w
            LEFT JOIN u ON u.s1 = w.a AND u.s2 = w.b
            WHERE u.s1 IS NULL
        )
        SELECT a, b, n_common, aa_ppm
        FROM nonedge
        ORDER BY aa_ppm DESC, a ASC, b ASC
        LIMIT {_AA_TOPK}
    """,
)
def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the undirected 3-NN graph:
    for every NON-edge pair sharing a neighbor, sum 1/ln(deg(w)) over
    the common neighbors w — the common-neighbor score that discounts
    promiscuous hubs (a shared rare neighbor says more than a shared
    hub), the standard upgrade from q_graph_jaccard_nbrs' set overlap;
    top-{k} missing edges = the near-duplicate candidates the kNN cut
    just missed.

    Determinism: degrees are exact ints; the single float surface is
    one ln per DEGREE VALUE (the wedge-center degree domain, bounded
    by 2k + in-degree), quantized half-up to 1e-6 ticks — the
    q_text_entropy log discipline; scores are exact integer sums of
    those ticks. deg(w) >= 2 for every wedge center by construction,
    so ln never sees 1.

    Plan: the q_graph_jaccard_nbrs wedge shape — adjacency self-join
    on the shared neighbor (fan-out bounded by kNN degree), weight
    attached by ONE keyed join to the degree-domain tick table,
    existing edges removed with a left anti join, TakeOrdered
    boundary. Headroom: aa_ppm sums 1e6-ticks over common neighbors —
    int64-safe past 9.2e12 shared neighbors per pair."""
    e = _edges(spark, sf_dir)
    u = (
        e.select(
            F.least("src", "dst").alias("s1"),
            F.greatest("src", "dst").alias("s2"),
        )
        .distinct()
    )
    adj = u.select(
        F.col("s1").alias("node"), F.col("s2").alias("nbr")
    ).unionAll(
        u.select(F.col("s2").alias("node"), F.col("s1").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").cast("long").alias("d"))
    wt = deg.filter(F.col("d") >= 2).select(
        F.col("node").alias("wnode"),
        F.floor(F.lit(1_000_000.0) / F.log(F.col("d").cast("double")) + 0.5)
        .cast("long")
        .alias("w_ppm"),
    )
    x = adj.select(F.col("node").alias("a"), "nbr")
    y = adj.select(F.col("node").alias("b"), F.col("nbr").alias("nbr_y"))
    wedges = (
        x.join(y, (F.col("nbr") == F.col("nbr_y")) & (F.col("a") < F.col("b")))
        .join(wt, F.col("wnode") == F.col("nbr"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w_ppm").cast("long").alias("aa_ppm"),
        )
    )
    nonedge = wedges.join(
        u,
        (F.col("s1") == F.col("a")) & (F.col("s2") == F.col("b")),
        "left_anti",
    )
    return nonedge.orderBy(
        F.col("aa_ppm").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_AA_TOPK)


q_graph_adamic_adar.__doc__ = q_graph_adamic_adar.__doc__.format(
    k=_AA_TOPK
)
