"""Hot FACT-key skew robustness probe (VERDICT r9 "Next round" #1 —
the user-key skew probe's analogue for the join-heavy relational and
dedup families).

The shipped TPC-H-ish generator is uniform over l_orderkey /
o_custkey / l_partkey, which hides hot-key join shapes: a real corpus
has celebrity orders (one batch job writing millions of lines under
one key), whale customers, and viral parts.  The r9 user-key probe
proved this class real (q_attribution_decay read 57.8x before the
day-lattice fix); the fact spines move 10-100x more rows at 100 TB.

Two corpora with the SAME total row counts, derived from a REAL
sf dir (default sf0.1) via DuckDB key rewrites:

  uniform: the sf dir verbatim
  hot    : ~40% of lineitem rows get ONE l_orderkey, ~40% get ONE
           l_partkey (independent row sets — orderkeys/partkeys with
           key % 10 < 4 collapse onto the smallest key with
           key % 10 >= 4, so the hot key pre-exists in the dim);
           ~40% of orders rows get ONE o_custkey the same way;
           ~40% of documents become byte-identical clones of one doc
           and ~40% of embeddings clones of one vector (the dedup /
           similarity analogue: boilerplate spam).

Every fact-keyed join query is timed on both.  Reading the ratio:

  - per-key-LINEAR work that lands on one task (a hot join partition
    or a hot groupBy before partial agg) is bounded by
    hot_fraction x parallelism ~ 0.4 x 32 ~ 13x in the worst case —
    a straggler, fixed by AQE skew-split (--aqe-check verifies
    OptimizeSkewedJoin engages on the real spine plans) or by
    salting (operators/skew.py);
  - per-key-QUADRATIC work (pair enumeration within the hot key)
    blows far past that — the real bomb.

Flag threshold stays the family-standard >5x; flags are adjudicated
straggler-vs-quadratic in BASELINE.md, not auto-failed.

Deterministic rewrites (key arithmetic, no RNG).  Usage:

  python tools/fact_skew_probe.py [--sf-dir DIR] [query ...]

Writes nothing to the repo; prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

#: fact-keyed queries grouped by the key the hot corpus stresses.
ORDERKEY_QUERIES = [
    "q_join_inner",
    "q_join_shuffle_hash",
    "q_join_multiway",
    "q_join_bloom",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q12",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_basket_lift",
    "q_zone_map_prune",
]
CUSTKEY_QUERIES = [
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q22",
    "q_gdpr_cascade",
    "q_rfm_segment",
    "q_scd2",
]
PARTKEY_QUERIES = [
    "q_tpch_q2",
    "q_tpch_q14",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q20",
]
DIGEST_QUERIES = [
    "q_dedup_exact",
    "q_dedup_cross_source",
    "q_dedup_substring",
    "q_stream_live_minhash",
    "q_stream_live_spans",
    "q_ml_hard_negatives",
    "q_dedup_paragraph",
    "q_dedup_jaccard",
    "q_dedup_containment",
    "q_dedup_minhash_exact",
    "q_dedup_simhash_exact",
    "q_dedup_cluster",
    "q_dedup_canonical",
    "q_multimodal_dedup",
    "q_dedup_embed",
    "q_sim_pairs",
]
PROBE_QUERIES = (
    ORDERKEY_QUERIES + CUSTKEY_QUERIES + PARTKEY_QUERIES + DIGEST_QUERIES
)

#: fraction selector: keys with key % 10 < HOT_MOD collapse (~40%).
HOT_MOD = 4


def make_hot_corpus(src: str, dst: str) -> None:
    """Rewrite the fact keys of a real sf dir into one-hot-key
    versions (DuckDB, deterministic)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def q1(sql: str):
        return con.sql(sql).fetchone()[0]

    pq = lambda t: os.path.join(src, f"{t}.parquet")  # noqa: E731
    hot_ok = q1(
        f"SELECT min(l_orderkey) FROM read_parquet('{pq('lineitem')}')"
        f" WHERE l_orderkey % 10 >= {HOT_MOD}"
    )
    hot_pk = q1(
        f"SELECT min(l_partkey) FROM read_parquet('{pq('lineitem')}')"
        f" WHERE l_partkey % 10 >= {HOT_MOD}"
    )
    hot_ck = q1(
        f"SELECT min(o_custkey) FROM read_parquet('{pq('orders')}')"
        f" WHERE o_custkey % 10 >= {HOT_MOD}"
    )
    hot_doc = q1(
        f"SELECT min(doc_id) FROM read_parquet('{pq('documents')}')"
        f" WHERE doc_id % 10 >= {HOT_MOD}"
    )
    hot_vec = q1(
        f"SELECT min(vec_id) FROM read_parquet('{pq('embeddings')}')"
        f" WHERE vec_id % 10 >= {HOT_MOD}"
    )

    def copy_rewritten(table: str, replace_sql: str) -> None:
        con.execute(
            f"COPY (SELECT * REPLACE ({replace_sql})"
            f" FROM read_parquet('{pq(table)}'))"
            f" TO '{os.path.join(dst, table + '.parquet')}'"
            " (FORMAT parquet)"
        )

    copy_rewritten(
        "lineitem",
        f"CASE WHEN l_orderkey % 10 < {HOT_MOD} THEN {hot_ok}"
        " ELSE l_orderkey END AS l_orderkey,"
        f" CASE WHEN l_partkey % 10 < {HOT_MOD} THEN {hot_pk}"
        " ELSE l_partkey END AS l_partkey",
    )
    copy_rewritten(
        "orders",
        f"CASE WHEN o_custkey % 10 < {HOT_MOD} THEN {hot_ck}"
        " ELSE o_custkey END AS o_custkey",
    )
    # clone text keeps n_chars consistent (quality filters read it)
    copy_rewritten(
        "documents",
        f"CASE WHEN doc_id % 10 < {HOT_MOD} THEN (SELECT text"
        f" FROM read_parquet('{pq('documents')}')"
        f" WHERE doc_id = {hot_doc}) ELSE text END AS text,"
        f" CASE WHEN doc_id % 10 < {HOT_MOD} THEN (SELECT n_chars"
        f" FROM read_parquet('{pq('documents')}')"
        f" WHERE doc_id = {hot_doc}) ELSE n_chars END AS n_chars",
    )
    copy_rewritten(
        "embeddings",
        f"CASE WHEN vec_id % 10 < {HOT_MOD} THEN (SELECT embedding"
        f" FROM read_parquet('{pq('embeddings')}')"
        f" WHERE vec_id = {hot_vec}) ELSE embedding END AS embedding",
    )
    for t in ("customer", "supplier", "part", "nation", "region", "events"):
        if os.path.exists(pq(t)):
            shutil.copy(pq(t), os.path.join(dst, f"{t}.parquet"))
    con.close()


#: AQE engagement check (VERDICT r9 "Next round" item 1 done-criterion):
#: at probe scale every shuffle partition is far below the PRODUCTION
#: skew threshold (256 MB), so the main table's "no" column only says
#: the optimizer correctly left small partitions alone. --aqe-check
#: re-runs the SHUFFLE_HASH/SMJ spines on the hot corpus with the
#: thresholds scaled DOWN to probe size and reports whether
#: OptimizeSkewedJoin actually splits (skew=true in the final adaptive
#: plan) — once plainly, once with forceOptimizeSkewedJoin (several
#: spines reuse the join's partitioning in a downstream aggregation,
#: which legitimately suppresses the split unless forced).
AQE_CHECK_QUERIES = [
    "q_join_inner",
    "q_join_shuffle_hash",
    "q_tpch_q12",
    "q_tpch_q18",
    "q_tpch_q21",
]
_AQE_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def aqe_check(spark, qs, hot: str) -> None:
    saved = {
        k: spark.conf.get(k, None)
        for k in list(_AQE_CONFS) + ["spark.sql.adaptive.forceOptimizeSkewedJoin"]
    }
    try:
        for k, v in _AQE_CONFS.items():
            spark.conf.set(k, v)
        print()
        print("AQE skew-split engagement (hot corpus, probe-scaled"
              " thresholds):")
        print("| query | split (plain) | split (forced) |")
        print("|---|---|---|")
        for name in AQE_CHECK_QUERIES:
            cells = []
            for force in ("false", "true"):
                spark.conf.set(
                    "spark.sql.adaptive.forceOptimizeSkewedJoin", force
                )
                df = qs[name](spark, hot)
                # collect() executes THIS DataFrame's QueryExecution —
                # a write() builds a fresh one whose adaptive plan
                # never finalizes on the handle we hold (all declared
                # queries return bounded results, so collect is safe)
                df.collect()
                plan = df._jdf.queryExecution().executedPlan().toString()
                cells.append("yes" if "skew=true" in plan else "no")
            print(f"| {name} | {cells[0]} | {cells[1]} |")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="real corpus the hot variant is derived from",
    )
    ap.add_argument(
        "--aqe-check",
        action="store_true",
        help="also verify OptimizeSkewedJoin engages on the spine"
        " queries at probe-scaled thresholds",
    )
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or PROBE_QUERIES

    hot = os.path.join(tempfile.gettempdir(), "nas-fact-skew-hot")
    shutil.rmtree(hot, ignore_errors=True)
    make_hot_corpus(args.sf_dir, hot)

    from ngram_analytics_spark.queries import build_registry
    from ngram_analytics_spark.session import get_spark

    spark = get_spark(app_name="nas-fact-skew-probe")
    qs = build_registry().queries

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"(hot corpus derived from {args.sf_dir}; HOT_MOD={HOT_MOD})")
    print("| query | uniform s | hot s | hot/uniform |")
    print("|---|---|---|---|")
    flagged = []
    for name in names:
        if name not in qs:
            continue
        try:
            tu = timed(name, args.sf_dir)
            th = timed(name, hot)
        except Exception as ex:
            print(f"| {name} | ERROR | {type(ex).__name__} | - |")
            continue
        ratio = th / tu if tu > 0 else float("inf")
        mark = " **FLAG**" if ratio > 5 else ""
        if ratio > 5:
            flagged.append(name)
        print(f"| {name} | {tu:.2f} | {th:.2f} | {ratio:.1f}{mark} |")
    print()
    print("flagged (>5x at equal rows):", flagged if flagged else "none")
    if args.aqe_check:
        aqe_check(spark, qs, hot)
    shutil.rmtree(hot, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
