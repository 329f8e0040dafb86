"""Count-min sketch properties: overestimation, error bound, and
exact merge linearity (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ngram_analytics_spark.operators.sketch import (
    countmin_build,
    countmin_estimate,
    countmin_merge,
)

SF = "/root/testdata/sf0.001"


def _li(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", "l_linenumber")
    )


def test_estimates_never_underestimate_and_bound_error(spark):
    li = _li(spark)
    sk = countmin_build(li, "l_partkey")
    exact = li.groupBy("l_partkey").agg(F.count("*").alias("exact"))
    n = li.count()
    got = (
        countmin_estimate(sk, exact.select("l_partkey"), "l_partkey")
        .join(exact, "l_partkey")
        .collect()
    )
    assert len(got) > 0
    # CM guarantees est >= exact always; est <= exact + eps*N with
    # eps = e/width holds w.h.p. — at 6k rows over a 4x4096 grid
    # collisions are rare, so assert a comfortably loose cap.
    import math

    cap = math.e / 4096 * n * 3
    for r in got:
        assert r["est"] >= r["exact"], r
        assert r["est"] <= r["exact"] + max(cap, 3), r


def test_merge_is_exactly_linear(spark):
    """sketch(A) + sketch(B) must equal sketch(A union B) cell-for-cell
    — the property that makes sketches shard-parallel at 100 TB."""
    li = _li(spark)
    a = li.filter(F.col("l_linenumber") % 2 == 0)
    b = li.filter(F.col("l_linenumber") % 2 == 1)
    merged = countmin_merge(
        countmin_build(a, "l_partkey"), countmin_build(b, "l_partkey")
    )
    single = countmin_build(li, "l_partkey")
    diff = (
        merged.join(single, ["d", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0))
            != F.coalesce(single["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_unseen_items_usually_estimate_zero(spark):
    li = _li(spark)
    sk = countmin_build(li, "l_partkey")
    probes = spark.range(10_000_000, 10_000_050).select(
        F.col("id").alias("l_partkey")
    )
    got = countmin_estimate(sk, probes, "l_partkey").collect()
    assert len(got) == 50
    zeros = sum(1 for r in got if r["est"] == 0)
    # depth-4 min over a sparse grid: collisions on all 4 rows are rare
    assert zeros >= 45
