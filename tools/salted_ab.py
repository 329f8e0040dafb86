"""Salted-vs-plain A/B on an actually-skewed corpus (VERDICT r11
item 7): the skew machinery (operators/skew.py) is hash-certified
semantics-preserving, but no bench entry DEMONSTRATED the salted path
beating the plain plan on a hot key. This tool produces that row.

Corpus: tools/fact_skew_probe.make_hot_corpus's hot variant of a real
sf dir (~40% of lineitem rows collapse onto ONE l_orderkey — the
celebrity-order shape). Workload: the lineitem >< orders spine join
on the hot key, reduced to a 1-row aggregate so timing measures the
join, not the sink.

Three arms, broadcast disabled on all (a broadcastable dim makes key
skew moot — the regime salting exists for is the broadcast-INELIGIBLE
join):

  A  plain join, AQE skew-split ON   — the DEFAULT first line: Spark
     splits the hot partition at runtime; nothing to do.
  B  plain join, AQE skew-split OFF  — the exposure: one task drags
     ~40% of the fact rows (the regime AQE can't reach: thresholds
     not met, stateful/streaming plans, non-SMJ shapes).
  C  salted join, AQE skew-split OFF — operators/skew.salted_join
     spreads the hot key over n_salts reducers by construction.

Two readings, both printed:

- WALL seconds per arm. Honesty note: at local[32] over sf<=1 the
  scan+shuffle of the fact table dominates and the hot reduce task
  (~40% of rows, but cheap per row) cannot straggle 32 cores — so
  wall alone under-states the skew. At 1000 executors the reduce
  side is GBs per task and IS the bottleneck, which is what the
  second metric extrapolates:
- REDUCER-LOAD CENSUS: rows landing on the join's maximum reduce
  partition as a share of all joined rows (spark_partition_id()
  census on the joined frame, deterministic). Plain-off puts the
  whole hot key on ONE reducer (~40%); salting divides it by
  n_salts by construction. This is the number that decides whether
  the plan survives a 100x scale-up.

Usage: python tools/salted_ab.py [--sf-dir DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from tools.fact_skew_probe import make_hot_corpus  # noqa: E402

    hot = os.path.join(tempfile.gettempdir(), "nas-salted-ab-hot")
    shutil.rmtree(hot, ignore_errors=True)
    make_hot_corpus(args.sf_dir, hot)

    from pyspark.sql import functions as F

    from ngram_analytics_spark.catalog import load
    from ngram_analytics_spark.operators.skew import salted_join
    from ngram_analytics_spark.session import get_spark

    spark = get_spark(app_name="nas-salted-ab")

    def plain(sf_dir: str):
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        return li.join(o, "l_orderkey").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias(
                "s"
            ),
        )

    def salted(sf_dir: str):
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders")
        j = salted_join(li, o, key="l_orderkey", small_key="o_orderkey")
        return j.agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias(
                "s"
            ),
        )

    prior_skew = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", "true"
    )

    def timed(builder, sf_dir: str, skew_on: bool) -> float:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_on else "false",
        )
        try:
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.perf_counter()
                builder(sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", prior_skew
            )

    def plain_joined(sf_dir: str):
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        return li.join(o, "l_orderkey")

    def salted_joined(sf_dir: str):
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders")
        return salted_join(li, o, key="l_orderkey", small_key="o_orderkey")

    def max_partition_share(joined) -> float:
        """share of joined rows on the busiest reduce partition —
        the reducer-load concentration the wall number can't see at
        local scale."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        # coalescing would merge the probe's view of the exchange
        prior_coalesce = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        try:
            parts = (
                joined.groupBy(F.spark_partition_id().alias("p"))
                .count()
                .collect()
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", prior_skew
            )
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled",
                prior_coalesce,
            )
        total = sum(r["count"] for r in parts)
        return max(r["count"] for r in parts) / total

    # equal-result sanity before timing: all three arms must agree
    rows = {
        "A": plain(hot).collect()[0],
        "C": salted(hot).collect()[0],
    }
    assert rows["A"] == rows["C"], f"salted != plain: {rows}"

    arms = [
        ("A plain + AQE skew split", lambda: timed(plain, hot, True)),
        ("B plain, skew split OFF", lambda: timed(plain, hot, False)),
        ("C salted, skew split OFF", lambda: timed(salted, hot, False)),
    ]
    print(
        f"(hot corpus from {args.sf_dir}; lineitem><orders on the"
        " one-hot l_orderkey; broadcast disabled; min of"
        f" {args.passes})"
    )
    print("| arm | seconds |")
    print("|---|---|")
    results = {}
    for name, run in arms:
        results[name] = run()
        print(f"| {name} | {results[name]:.3f} |")
    sp = max_partition_share(plain_joined(hot))
    ss = max_partition_share(salted_joined(hot))
    print()
    print("| join (skew split OFF) | max reduce-partition share |")
    print("|---|---|")
    print(f"| plain  | {sp:.1%} |")
    print(f"| salted | {ss:.1%} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
