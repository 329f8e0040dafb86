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
