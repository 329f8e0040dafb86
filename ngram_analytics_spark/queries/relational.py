"""Relational core: scans, filters, joins, aggregations, windows, sorts,
set operations, scalar functions (SURVEY.md §2.B).

Every query is a lazy DataFrame plan over the parquet catalog; Catalyst
handles pushdown/pruning/join-strategy selection. Scale notes are on the
individual queries where the plan shape matters at 100 TB.

Determinism conventions (FIXTURES.md): decimal-accumulated float aggs
(functions.deterministic), unique-key tie-breaks on every top-k,
timestamps emitted as formatted strings, identical aliases both sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ngram_analytics_spark.catalog import TABLES, load
from ngram_analytics_spark.functions.deterministic import (
    DEC,
    davg,
    davg_fixed,
    dsum,
    dsum_fixed,
    oracle_davg,
    oracle_davg_fixed,
    oracle_dsum,
    oracle_dsum_fixed,
    oracle_round4det,
    round4det,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()


# ---------------------------------------------------------------- scans

@REG.register(
    "q_scan_project",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection; Catalyst prunes the read schema to the
    4 referenced columns (verify via .explain: ReadSchema)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
    )


@REG.register(
    "q_scan_count",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, count(*) AS n_rows FROM {t}" for t in TABLES
    ),
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan rowcount per table, unioned."""
    parts = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"), F.count("*").alias("n_rows")
        )
        for t in TABLES
    ]
    return reduce(DataFrame.unionAll, parts)


# ------------------------------------------------------ filters / exprs

@REG.register(
    "q_filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
          AND l_returnflag IN ('A', 'R')
          AND (l_quantity >= 30 OR l_discount <= 0.02)
          AND l_linestatus LIKE 'F%'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates + BETWEEN + IN + LIKE; all
    pushable to the parquet scan (PushedFilters in .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1998-12-31")
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_quantity") >= 30) | (F.col("l_discount") <= 0.02))
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@REG.register(
    "q_expr_case",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 100000 THEN 'small'
                    WHEN o_totalprice < 300000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_adj,
               CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                    THEN 1 ELSE 0 END AS urgent
        FROM orders
    """,
)
def q_expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + null-safe expressions (nullif/coalesce)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_adj"
        ),
        F.when(
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"),
            1,
        )
        .otherwise(0)
        .alias("urgent"),
    )


# ---------------------------------------------------------------- joins

@REG.register(
    "q_join_inner",
    oracle="""
        SELECT o_orderkey, c_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join — Catalyst picks broadcast vs sort-merge by size;
    AQE re-plans at runtime if estimates were off."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@REG.register(
    "q_join_broadcast",
    oracle=f"""
        SELECT p_brand, count(*) AS n_items,
               {oracle_dsum_fixed("l_quantity")} AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: `part` is a dimension (O(SF) small) — ship it
    to every executor; the 100 TB fact side never shuffles for the join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum_fixed("l_quantity", "sum_qty"),
        )
    )


@REG.register(
    "q_join_left",
    oracle="""
        SELECT c_custkey,
               count(o_orderkey) AS n_big_orders,
               max(o_totalprice) AS max_price
        FROM customer LEFT JOIN (
            SELECT * FROM orders WHERE o_totalprice > 400000
        ) big ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying orders
    (count = 0, max = NULL)."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@REG.register(
    "q_join_full",
    oracle="""
        SELECT coalesce(cn.c_nationkey, sn.s_nationkey) AS nationkey,
               coalesce(cn.n_cust, 0) AS n_cust,
               coalesce(sn.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey, count(*) AS n_cust
              FROM customer GROUP BY c_nationkey) cn
        FULL JOIN (SELECT s_nationkey, count(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey) sn
          ON cn.c_nationkey = sn.s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nations with only
    customers vs only suppliers survive with zero-filled counts)."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        F.coalesce(cn.c_nationkey, sn.s_nationkey).alias("nationkey"),
        F.coalesce(cn.n_cust, F.lit(0)).alias("n_cust"),
        F.coalesce(sn.n_supp, F.lit(0)).alias("n_supp"),
    )


@REG.register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no row duplication, right side only probed."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@REG.register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@REG.register(
    "q_join_theta",
    oracle="""
        SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
               ROUND(b.s_acctbal - a.s_acctbal, 4) AS bal_gap
        FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) self-join via operators.rangejoin.theta_join_auto:
    below the size bound Spark plans the broadcast nested loop (optimal
    for a memory-sized side — supplier at test scale); above it the
    SAME call routes through the banded equi-join, which never
    broadcasts a data-sized side (tests pin both plans + result
    equality)."""
    from ngram_analytics_spark.operators.rangejoin import theta_join_auto

    s = load(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("s1"), F.col("s_acctbal").alias("_bal_a"))
    b = s.select(F.col("s_suppkey").alias("s2"), F.col("s_acctbal").alias("_bal_b"))
    return theta_join_auto(a, b, "_bal_a", "_bal_b", op="<").select(
        "s1",
        "s2",
        F.round(F.col("_bal_b") - F.col("_bal_a"), 4).alias("bal_gap"),
    )


@REG.register(
    "q_join_multiway",
    oracle=f"""
        SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS oyear,
               {oracle_dsum_fixed("l_extendedprice * (1 - l_discount)")} AS revenue,
               count(*) AS n_rows
        FROM region
        JOIN nation   ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY r_name, CAST(year(o_orderdate) AS INTEGER)
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: 3 broadcast dims (region/nation/customer) + one
    fact-fact join (orders⋈lineitem) that co-shuffles on orderkey.
    The only big exchange is fact⋈fact — dims never shuffle; the
    orders side takes a SHUFFLE_HASH hint (A/B at sf0.1: 0.54 s
    sort-merge -> 0.41 s — both sort phases skipped; same tradeoff
    note as q_join_shuffle_hash: per-task build side must fit memory,
    which the per-partition orders slice does under AQE sizing)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        "r_name", F.year("o_orderdate").alias("oyear")
    ).agg(
        dsum_fixed(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


@REG.register(
    "q_join_interval",
    oracle=f"""
        SELECT o_orderkey, count(*) AS n_early_ships,
               {oracle_dsum("l_quantity")} AS qty_early
        FROM orders JOIN lineitem
          ON o_orderkey = l_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderkey
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: equi key + range predicate. Catalyst runs the
    equi-join and applies the range residual as a post-join filter —
    no nested loop, scales like a plain join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_early_ships"), dsum("l_quantity", "qty_early"))
    )


# --------------------------------------------------------- aggregations

@REG.register(
    "q_agg_global",
    oracle=f"""
        SELECT count(*) AS n_rows,
               {oracle_dsum("l_quantity")} AS sum_qty,
               {oracle_davg("l_extendedprice")} AS avg_price,
               strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
               strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate: partial-agg on every partition, single-row final."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@REG.register(
    "q_agg_group",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {oracle_dsum_fixed("l_quantity")} AS sum_qty,
               {oracle_dsum_fixed("l_extendedprice")} AS sum_base_price,
               {oracle_dsum_fixed("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               {oracle_dsum_fixed("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               {oracle_davg_fixed("l_quantity")} AS avg_qty,
               {oracle_davg_fixed("l_extendedprice")} AS avg_price,
               {oracle_davg_fixed("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with map-side combine — the
    canonical 100 TB agg (grouped cardinality is tiny; shuffle carries
    only partial states).

    Money/quantity sums ride the fixed-point int64 path (dsum_fixed):
    pure long adds inside whole-stage codegen vs BigDecimal-backed
    decimal(25,8) states — measured ~3x on this query at sf0.1."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum_fixed("l_quantity", "sum_qty"),
        dsum_fixed("l_extendedprice", "sum_base_price"),
        dsum_fixed(disc_price, "sum_disc_price"),
        dsum_fixed(disc_price * (1 + F.col("l_tax")), "sum_charge"),
        davg_fixed("l_quantity", "avg_qty"),
        davg_fixed("l_extendedprice", "avg_price"),
        davg_fixed("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@REG.register(
    "q_agg_distinct",
    oracle=f"""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS uniq_parts,
               count(DISTINCT l_suppkey) AS uniq_supps,
               CAST(ROUND(SUM(DISTINCT CAST(l_quantity AS DECIMAL(25,8))), 4) AS DOUBLE)
                   AS sum_uniq_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM(DISTINCT): planned as expand + two-phase agg; distinct
    dedup happens pre-shuffle per partition."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
        F.round(F.sum_distinct(F.col("l_quantity").cast(DEC)), 4)
        .cast("double")
        .alias("sum_uniq_qty"),
    )


@REG.register("q_agg_approx_distinct")  # rows-only: HLL sketch values are impl-specific
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++). No SQL oracle — sketch
    estimates are engine-specific; the invariant (within rsd of exact)
    is asserted in tests/test_operators.py."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_supps"),
    )


@REG.register(
    "q_agg_rollup",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {oracle_dsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag + per-pair).

    Degenerate-input note (tools/empty_probe.py, r11): on a 0-ROW
    input Spark's grouping-sets machinery emits NO rows while
    DuckDB/PostgreSQL emit the global grouping set's single row —
    an engine-level semantic difference, not a plan bug; synthesizing
    the row would need a data-dependent union. Documented as outside
    the empty-slice contract (adjudicated in BASELINE.md r11).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


@REG.register(
    "q_agg_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {oracle_dsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations. Empty-input semantics:
    the q_agg_rollup documented engine difference applies."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


@REG.register(
    "q_agg_grouping_sets",
    oracle=f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {oracle_dsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan as
    rollup/cube). Empty-input semantics: the q_agg_rollup documented
    engine difference applies."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(25,8))), 4) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@REG.register(
    "q_agg_having",
    oracle=f"""
        SELECT o_custkey, count(*) AS n_orders,
               {oracle_dsum("o_totalprice")} AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 12)
    )


@REG.register(
    "q_agg_collect",
    oracle="""
        SELECT c_nationkey, count(*) AS n_cust,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segs
        FROM customer
        GROUP BY c_nationkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg: collect_set sorted for determinism, flattened to a
    '|'-joined string so the output schema stays scalar-only (the
    driver's pandas canonicalizer cannot hash list cells)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.array_join(
            F.sort_array(F.collect_set("c_mktsegment")), "|"
        ).alias("segs"),
    )


# -------------------------------------------------------------- windows

@REG.register(
    "q_win_rank",
    oracle="""
        SELECT c_custkey, c_nationkey,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
               rank() OVER (PARTITION BY c_nationkey
                            ORDER BY CAST(FLOOR(c_acctbal / 1000) AS INTEGER) DESC) AS rk,
               dense_rank() OVER (PARTITION BY c_nationkey
                                  ORDER BY CAST(FLOOR(c_acctbal / 1000) AS INTEGER) DESC) AS drk,
               ntile(4) OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS nt
        FROM customer
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions. row_number/ntile use a fully deterministic
    (unique-key) ordering; rank/dense_rank use a coarse bucket ordering
    so ties actually occur."""
    c = load(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("int")
    w_unique = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_coarse = W.partitionBy("c_nationkey").orderBy(bucket.desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_coarse).alias("rk"),
        F.dense_rank().over(w_coarse).alias("drk"),
        F.ntile(4).over(w_unique).alias("nt"),
    )


@REG.register(
    "q_win_analytic",
    oracle="""
        SELECT o_orderkey, o_custkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               first_value(o_totalprice) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS first_price,
               last_value(o_totalprice) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over a deterministic per-customer order."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w_full).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@REG.register(
    "q_win_frame",
    oracle=f"""
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(25,8))) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   4) AS DOUBLE) AS run_spend,
               {oracle_round4det(
                   "CAST(sum(CAST(o_totalprice AS DECIMAL(25,8))) OVER "
                   "(w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) "
                   "/ count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
               )} AS avg3,
               count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
                   AS cnt_range
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running / sliding ROWS frames + a numeric RANGE frame."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_3 = w.rowsBetween(-2, W.currentRow)
    w_range = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, W.currentRow)
    )
    dec_price = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(dec_price).over(w_run), 4).cast("double").alias("run_spend"),
        round4det(
            F.sum(dec_price).over(w_3).cast("double") / F.count("*").over(w_3)
        ).alias("avg3"),
        F.count("*").over(w_range).alias("cnt_range"),
    )


# -------------------------------------------------------- sorts / top-k

@REG.register(
    "q_sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
        LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — physical TakeOrderedAndProject: each
    partition keeps its local top-100; only k rows reach the driver-side
    merge. No full sort at any scale."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
    ).limit(100).select("o_orderkey", "o_custkey", "o_totalprice")


@REG.register(
    "q_topk_pergroup",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey ASC)
                       AS rn
            FROM orders
        ) WHERE rn <= 5
    """,
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window + filter; Spark pushes the
    rn<=k limit into the window sort (WindowGroupLimit) so each group
    only materializes k rows."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------- setops

@REG.register(
    "q_set_union",
    oracle="""
        SELECT k, count(*) AS n_appear FROM (
            SELECT c_custkey AS k FROM customer
            UNION ALL
            SELECT o_custkey AS k FROM orders
        ) GROUP BY k
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + aggregate (bag semantics preserved)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.unionAll(o).groupBy("k").agg(F.count("*").alias("n_appear"))


@REG.register(
    "q_set_intersect",
    oracle="""
        SELECT c_custkey AS k FROM customer
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics on both engines)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("k"))
    )
    return c.intersect(o)


@REG.register(
    "q_set_except",
    oracle="""
        SELECT p_partkey AS k FROM part
        EXCEPT
        SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 45
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): parts never shipped in large quantity."""
    p = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_partkey").alias("k"))
    )
    return p.subtract(li)


@REG.register(
    "q_pivot",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F,
               {oracle_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
               count(*) FILTER (WHERE l_linestatus = 'F') AS n_F,
               count(*) FILTER (WHERE l_linestatus = 'O') AS n_O
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one column pair per l_linestatus value.
    Expressed as conditional aggregation — identical plan to .pivot()
    with explicit values, and oracle-expressible."""
    li = load(spark, sf_dir, "lineitem")
    agg_cols = []
    for v in ("F", "O"):
        cond = F.when(F.col("l_linestatus") == v, F.col("l_quantity"))
        agg_cols.append(dsum(cond, f"qty_{v}"))
        agg_cols.append(
            F.count(F.when(F.col("l_linestatus") == v, 1)).alias(f"n_{v}")
        )
    return li.groupBy("l_returnflag").agg(*agg_cols)


@REG.register(
    "q_unpivot",
    oracle="""
        SELECT c_custkey, metric, val FROM (
            SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
            UNION ALL
            SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns to (key, metric, value) rows via the
    native unpivot operator (Expand-based, single scan)."""
    c = load(spark, sf_dir, "customer").withColumn(
        "nationkey_d", F.col("c_nationkey").cast("double")
    )
    return (
        c.unpivot(
            "c_custkey",
            ["c_acctbal", "nationkey_d"],
            "metric",
            "val",
        )
        .withColumn(
            "metric",
            F.when(F.col("metric") == "c_acctbal", "acctbal").otherwise("nationkey"),
        )
    )


# ------------------------------------------------------ scalar functions

@REG.register(
    "q_fn_string",
    oracle="""
        SELECT c_custkey,
               upper(c_mktsegment) AS seg_u,
               lower(c_name) AS name_l,
               trim(concat(' ', c_name, ' ')) AS name_trim,
               substr(c_name, 1, 8) AS name_pre,
               concat(c_name, '-', c_mktsegment) AS name_seg,
               replace(c_name, 'Customer', 'Cust') AS name_short,
               length(c_name) AS name_len,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               len(string_split(c_name, '#')) AS n_parts
        FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (upper/lower/trim/substr/concat/replace/
    length/regexp/split)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_u"),
        F.lower("c_name").alias("name_l"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.concat(F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.size(F.split(F.col("c_name"), "#")).alias("n_parts"),
    )


@REG.register(
    "q_fn_date",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(day(o_orderdate) AS INTEGER) AS dy,
               CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
               strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family; ISO day-of-week derived portably
    (Spark dayofweek is Sunday=1; oracle isodow is Monday=1)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("iso_dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_y2k"),
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
    )


@REG.register(
    "q_fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 2) AS price_r2,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_fl,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ce,
               round(abs(l_discount - 0.05), 4) AS disc_dev,
               round(power(l_quantity, 2), 4) AS qty_sq,
               round(ln(l_extendedprice), 4) AS price_ln,
               round(sqrt(l_quantity), 4) AS qty_sqrt,
               l_orderkey % 7 AS key_mod
        FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor("l_extendedprice").alias("price_fl"),
        F.ceil("l_extendedprice").alias("price_ce"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@REG.register(
    "q_fn_array",
    oracle="""
        SELECT doc_id,
               len(toks) AS n_tok,
               array_to_string(toks[1:3], ',') AS first3,
               list_contains(toks, 'the') AS has_the,
               len(list_distinct(toks)) AS n_uniq,
               list_sort(toks)[1] AS first_sorted,
               len(list_filter(toks, t -> length(t) > 4)) AS n_long,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
                   AS total_len,
               len(flatten([toks[1:2], toks[3:4]])) AS n_flat
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE text IS NOT NULL)
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family incl. higher-order transform/filter/aggregate.

    NULL contract (tools/null_probe.py): NULL text filtered on BOTH
    engines — the engines disagree on NULL-array scalars (Spark
    concat_ws renders '' where DuckDB keeps NULL)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .withColumn("toks", F.split(F.col("text"), " "))
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.concat_ws(",", F.slice(F.col("toks"), 1, 3)).alias("first3"),
        F.array_contains("toks", "the").alias("has_the"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.element_at(F.sort_array("toks"), 1).alias("first_sorted"),
        F.size(F.filter(F.col("toks"), lambda t: F.length(t) > 4)).alias("n_long"),
        F.aggregate(
            F.col("toks"),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.length(t),
        ).alias("total_len"),
        F.size(
            F.flatten(
                F.array(F.slice(F.col("toks"), 1, 2), F.slice(F.col("toks"), 3, 2))
            )
        ).alias("n_flat"),
    )


@REG.register(
    "q_fn_map_json",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
               json_extract_string(props, '$.nope') IS NULL AS missing_is_null
        FROM events
    """,
)
def q_fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props JSON-string column."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.nope").isNull().alias("missing_is_null"),
    )
