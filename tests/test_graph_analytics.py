"""Unit tests for the similarity-graph analytics operators
(operators.graph.knn_graph_edges / pagerank_int) on small graphs with
hand-checkable answers, independent of the SQL-oracle diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from ngram_analytics_spark.operators.graph import (
    knn_graph_edges,
    pagerank_int,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestPagerankInt:
    def test_two_node_cycle_is_symmetric_and_stable(self, spark):
        """a<->b: all mass circulates; both nodes stay at the base."""
        nodes = spark.createDataFrame([(1,), (2,)], "vec_id long")
        e = _edges(spark, [(1, 2), (2, 1)])
        got = {
            r["node"]: r["rank"]
            for r in pagerank_int(nodes, e, iters=5).collect()
        }
        assert got[1] == got[2]
        # damping floor + 85% of a full base contribution
        assert got[1] == 150000 + (85 * 1_000_000) // 100

    def test_sink_accumulates_more_than_source(self, spark):
        """1->3, 2->3: node 3 receives, nodes 1/2 keep the floor."""
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "vec_id long")
        e = _edges(spark, [(1, 3), (2, 3)])
        got = {
            r["node"]: r["rank"]
            for r in pagerank_int(nodes, e, iters=3).collect()
        }
        assert got[3] > got[1] == got[2] == 150000
        # exact integer trace: r1(3) = 150000 + 85*2e6//100 = 1850000;
        # after that 1 and 2 contribute 150000 each per round.
        assert got[3] == 150000 + (85 * (150000 + 150000)) // 100

    def test_rank_is_partitioning_invariant(self, spark):
        """Integer arithmetic => identical ranks under any shuffle
        layout (the property float PageRank lacks)."""
        nodes = spark.range(0, 50).select(F.col("id").alias("vec_id"))
        e = _edges(
            spark, [(i, (i * 7 + 3) % 50) for i in range(50)]
        )
        a = pagerank_int(nodes, e, iters=4).collect()
        b = pagerank_int(
            nodes.repartition(7), e.repartition(11), iters=4
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestKnnGraphEdges:
    def test_axis_vectors_pick_nearest_cluster(self, spark):
        """Two tight clusters on orthogonal axes: every node's top
        neighbors stay inside its own cluster."""
        rows = []
        for i in range(4):
            rows.append((i, [10.0 + i, float(i % 2), 0.0]))
        for i in range(4, 8):
            rows.append((i, [0.0, float(i % 2), 10.0 + i]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        got = knn_graph_edges(emb, k=2, min_cos=0.1, dim=3).collect()
        for r in got:
            assert (r["src"] < 4) == (r["dst"] < 4), r
        # every node found 2 same-cluster neighbors
        by_src = {}
        for r in got:
            by_src.setdefault(r["src"], []).append(r["dst"])
        assert all(len(v) == 2 for v in by_src.values())
        assert len(by_src) == 8

    def test_k_and_threshold_bound_out_degree(self, spark):
        rows = [(i, [1.0, float(i)]) for i in range(10)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        got = (
            knn_graph_edges(emb, k=3, min_cos=0.5, dim=2)
            .groupBy("src")
            .agg(F.count("*").alias("d"))
            .collect()
        )
        assert got  # vacuous-pass guard: the graph must have edges
        assert all(r["d"] <= 3 for r in got)


class TestHitsInt:
    def test_star_authority_closed_form(self, spark):
        """Directed star 1->3, 2->3, 3->1 (hand-unrolled):

          auth1: 3 has in-degree 2, 1 has in-degree 1
          hub1(1) = auth1(3) = 2, hub1(2) = 2, hub1(3) = auth1(1) = 1
          auth2(3) = hub1(1) + hub1(2) = 4, auth2(1) = hub1(3) = 1
        """
        from ngram_analytics_spark.operators.graph import hits_int

        e = _edges(spark, [(1, 3), (2, 3), (3, 1)])
        got = {r["node"]: r for r in hits_int(e).collect()}
        assert set(got) == {1, 3}
        assert got[3]["auth1"] == 2
        assert got[3]["hub1"] == 1
        assert got[3]["auth2"] == 4
        assert got[1]["auth1"] == 1
        assert got[1]["hub1"] == 2
        assert got[1]["auth2"] == 1

    def test_no_out_edge_node_gets_zero_hub(self, spark):
        """2 -> 1 only: node 1 is an authority with no out-edges, so
        hub1 coalesces to 0 and auth2 = 0-hub contribution is absent
        (1 keeps auth2 from hub1(2))."""
        from ngram_analytics_spark.operators.graph import hits_int

        e = _edges(spark, [(2, 1)])
        got = {r["node"]: r for r in hits_int(e).collect()}
        assert set(got) == {1}
        assert got[1]["auth1"] == 1
        assert got[1]["hub1"] == 0
        assert got[1]["auth2"] == 1

    def test_partitioning_invariant(self, spark):
        from ngram_analytics_spark.operators.graph import hits_int

        pairs = [(i, (i * 7 + 3) % 23) for i in range(23)]
        e = _edges(spark, pairs)
        a = sorted(map(tuple, hits_int(e).collect()))
        b = sorted(map(tuple, hits_int(e.repartition(7)).collect()))
        assert a == b
