"""TPC-H Q21 / Q22 analogues (adapted to this schema: no partsupp,
no l_receiptdate/l_commitdate, no c_phone — lateness is derived from
o_orderdate and the country code from c_nationkey) plus a GDPR-style
delete-cascade audit.

The reference engine has no counterpart (its sole operator is the
n-gram transform, NGramTransform.java:95-134); this is north-star
surface (SURVEY.md §2.B): the hardest classic decision-support shapes
— double-negated existence tests and scalar-subquery anti-joins — and
the data-governance cascade a pipeline must answer before it may
serve training data.

Scale notes: Q21's two EXISTS / NOT-EXISTS are NOT expressed as
self-joins of the lineitem spine (three shuffles, skew on hot
orders); the per-(order, supplier) pre-aggregation makes both
existence tests plain integer comparisons after ONE l_orderkey
exchange chain. Q22's scalar subquery is a 1-row broadcast; the
anti-join shuffles on the customer key only. The cascade audit keys
every hop on its natural foreign key, so each table shuffles at most
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ngram_analytics_spark.catalog import load
from ngram_analytics_spark.functions.deterministic import (
    dsum_fixed,
    oracle_dsum_fixed,
    oracle_round4det,
    round4det,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()

#: Q21 lateness cutoff: a line shipped more than 45 days after its
#: order date counts as late (this lineitem layout has no
#: l_receiptdate/l_commitdate pair; reference Q21 uses
#: l_receiptdate > l_commitdate).
_LATE_DAYS = 45


@REG.register(
    "q_tpch_q21",
    oracle=f"""
        WITH sl AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   max(CASE WHEN CAST(l.l_shipdate AS DATE)
                                 > CAST(o.o_orderdate AS DATE)
                                   + {_LATE_DAYS}
                            THEN 1 ELSE 0 END) AS is_late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY l.l_orderkey, l.l_suppkey
        ), per_order AS (
            SELECT l_orderkey,
                   count(*) AS n_supp,
                   sum(is_late) AS n_late,
                   min(CASE WHEN is_late = 1 THEN l_suppkey END)
                       AS late_supp
            FROM sl GROUP BY l_orderkey
        )
        SELECT s.s_suppkey, s.s_name, n.n_name,
               count(*) AS numwait
        FROM per_order p
        JOIN supplier s ON p.late_supp = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.n_supp > 1 AND p.n_late = 1
        GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue (suppliers-who-kept-orders-waiting): for
    finalized orders served by MORE than one supplier, find the
    supplier who was the ONLY late shipper — the double existence
    test (EXISTS another supplier, NOT EXISTS another late supplier)
    that makes Q21 the classic anti-join benchmark. Lateness is
    l_shipdate > o_orderdate + 45 days (schema adaptation, see module
    docstring; reference Q21 compares l_receiptdate to l_commitdate).

    Spark-first shape: instead of the literal plan (lineitem
    self-joined twice for the EXISTS / NOT EXISTS — three fact
    shuffles), pre-aggregate to (orderkey, suppkey, is_late) and then
    to per-order counts: `n_supp > 1 AND n_late = 1` IS the double
    existence test, computed after a single l_orderkey exchange chain
    with map-side combine. The orders edge is hinted SHUFFLE_HASH
    (fact-fact, never broadcastable at scale — the q_join_multiway
    discipline), which also makes the join's l_orderkey partitioning
    satisfy BOTH downstream aggregations (hash({ok}) clusters
    {ok, sk}), collapsing the plan to exactly two exchanges — one per
    join input — with zero aggregation shuffles (the default
    broadcast plan paid two extra agg exchanges). Supplier and nation
    dims broadcast at the end, touching only the few attributed
    orders."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("ship")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.to_date("o_orderdate").alias("odate"))
    )
    sl = (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("ship") > F.date_add(F.col("odate"), _LATE_DAYS), 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = sl.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.min(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
    )


@REG.register(
    "q_tpch_q22",
    oracle=f"""
        WITH avg_bal AS (
            SELECT (CAST(floor(abs(
                        CAST(sum(CAST(c_acctbal AS DECIMAL(25,8)))
                             AS DOUBLE) / count(*)
                    ) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS ab
            FROM customer WHERE c_acctbal > 0.0
        ), mx AS (
            SELECT max(o_orderdate) AS m FROM orders
        ), rich_idle AS (
            SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
            FROM customer c, avg_bal
            WHERE c.c_acctbal > avg_bal.ab
              AND NOT EXISTS (SELECT 1 FROM orders o, mx
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate
                                    >= mx.m - INTERVAL 30 DAY)
        )
        SELECT n.n_name AS cntrycode,
               count(*) AS numcust,
               {oracle_dsum_fixed("r.c_acctbal")} AS totacctbal
        FROM rich_idle r JOIN nation n ON r.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue (global-sales-opportunity): customers with
    above-average positive account balance and NO order in the final
    30 days of the order history (lapsed customers), counted and
    totalled per country — the scalar-subquery + NOT-EXISTS anti-join
    composite. Country code comes from the nation dim (this customer
    layout has no c_phone; reference Q22 substrings the phone prefix,
    and its "never ordered" test is recency-bounded here because the
    synthetic data gives every customer at least one order).

    Plan: the average balance and the max order date are 1-row
    aggregates broadcast into scan filters (scalar subqueries); the
    NOT EXISTS is a left-anti join against the recent-orders
    customer-key projection — one shuffle each side on c_custkey;
    the nation dim broadcasts. The
    threshold double is decimal-summed then floor-quantized to 4dp
    IDENTICALLY in both engines, so the strict `>` compare can never
    lose an ulp (account balances carry 2dp; a 4dp-exact threshold
    decides every row the same way in both engines)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.floor(
                    F.abs(
                        F.sum(F.col("c_acctbal").cast("decimal(25,8)"))
                        .cast("double")
                        / F.count("*")
                    )
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("ab")
        )
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    mx = orders.agg(F.max("o_orderdate").alias("m"))
    recent_keys = (
        orders.join(F.broadcast(mx))
        .filter(
            F.col("o_orderdate") >= F.col("m") - F.expr("INTERVAL 30 DAYS")
        )
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(
        recent_keys, rich.c_custkey == recent_keys.o_custkey, "left_anti"
    )
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum_fixed("c_acctbal", "totacctbal"),
        )
    )


@REG.register(
    "q_gdpr_cascade",
    oracle="""
        WITH del_cust AS (
            SELECT c_custkey FROM customer
            WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '2'
        ), del_orders AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
        ), c AS (
            SELECT count(*) AS n_total,
                   (SELECT count(*) FROM del_cust) AS n_deleted
            FROM customer
        ), o AS (
            SELECT count(*) AS n_total,
                   (SELECT count(*) FROM del_orders) AS n_deleted
            FROM orders
        ), l AS (
            -- coalesce: on an EMPTY lineitem slice sum() is NULL but
            -- the Spark side's count() reads 0 (empty-probe r11)
            SELECT count(*) AS n_total,
                   CAST(coalesce(sum(CASE WHEN l_orderkey IN
                                 (SELECT o_orderkey FROM del_orders)
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_deleted
            FROM lineitem
        )
        SELECT 'customer' AS entity, n_total, n_deleted,
               n_total - n_deleted AS n_kept FROM c
        UNION ALL SELECT 'orders', n_total, n_deleted,
               n_total - n_deleted FROM o
        UNION ALL SELECT 'lineitem', n_total, n_deleted,
               n_total - n_deleted FROM l
    """,
)
def q_gdpr_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact audit: a deterministic ~12.5% of
    customers (md5-prefix selection — auditable and
    partitioning-independent, the q_sample_hash discipline) request
    deletion; the cascade follows the foreign keys
    customer -> orders -> lineitem and reports total / deleted / kept
    row counts per table — the blast-radius report a governed data
    platform produces before executing a purge.

    Plan: each hop is a semi-join on the natural key (orders on
    c_custkey, lineitem on l_orderkey), so every table shuffles at
    most once and the deleted-key sets stay as distributed frames
    (never collected); the three 1-row count aggregates union into
    the report. At 100 TB the same plan holds: the cascade is
    bounded by one shuffle per foreign-key edge."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    del_cust = cust.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) < "2"
    )
    del_orders = orders.join(
        del_cust, orders.o_custkey == del_cust.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi"
    )

    def audit(total_df: DataFrame, deleted_df: DataFrame, name: str):
        t = total_df.agg(F.count("*").alias("n_total"))
        d = deleted_df.agg(F.count("*").alias("n_deleted"))
        return t.join(d).select(
            F.lit(name).alias("entity"),
            "n_total",
            "n_deleted",
            (F.col("n_total") - F.col("n_deleted")).alias("n_kept"),
        )

    return (
        audit(cust, del_cust, "customer")
        .unionAll(audit(orders, del_orders, "orders"))
        .unionAll(audit(li, del_li, "lineitem"))
    )


@REG.register(
    "q_join_bloom",
    oracle=f"""
        SELECT l.l_returnflag,
               count(*) AS n_lines,
               {oracle_dsum_fixed("l.l_extendedprice * (1 - l.l_discount)")}
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: a selective dimension filter
    (urgent-priority orders) joined into the lineitem spine as a
    sort-merge join (MERGE hint), the shape where Catalyst's
    InjectRuntimeFilter rewrites the fact scan with a
    `might_contain(bloom_filter_agg(o_orderkey), xxhash64(l_orderkey))`
    semi-filter — rows that cannot join are dropped AT THE SCAN,
    before the shuffle, cutting exchange volume by the filter's
    selectivity. That is the 100 TB play: when the dim is too big to
    broadcast but still selective, the bloom filter is the only thing
    standing between you and shuffling the full fact table.

    At grading scale the application-side scan sits below Spark's
    `runtime.bloomFilter.applicationSideScanSizeThreshold` (10 GB
    default), so the optimization is dormant here and the plan is a
    plain SMJ — the injection itself is pinned by a plan test that
    lowers the thresholds (tests/test_plans.py), keeping this query's
    graded semantics identical to the oracle's plain join at every
    scale. Revenue rides the fixed-point decimal path."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(o.hint("MERGE"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            dsum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


@REG.register(
    "q_agg_moments",
    oracle="""
        WITH t AS (
            SELECT event_type,
                   CAST(floor(abs(value) * 10000.0 + 0.5) AS HUGEINT)
                   * (CASE WHEN value < 0 THEN -1 WHEN value > 0 THEN 1
                           ELSE 0 END) AS x
            FROM events
        ), s AS (
            SELECT event_type,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(x) AS DOUBLE) AS s1,
                   CAST(sum(x * x) AS DOUBLE) AS s2,
                   CAST(sum(x * x * x) AS DOUBLE) AS s3,
                   CAST(sum(x * x * x * x) AS DOUBLE) AS s4
            FROM t GROUP BY event_type
        ), m AS (
            SELECT event_type, n,
                   s1 / n AS mean_t,
                   (s2 - s1 * s1 / n) / n AS m2,
                   (s3 - 3.0 * s1 * s2 / n + 2.0 * s1 * s1 * s1 / (n * n))
                       / n AS m3,
                   (s4 - 4.0 * s1 * s3 / n + 6.0 * s1 * s1 * s2 / (n * n)
                       - 3.0 * s1 * s1 * s1 * s1 / (n * n * n)) / n AS m4
            FROM s
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               (CAST(floor(abs(mean_t / 10000.0) * 10000.0 + 0.5)
                     AS DOUBLE) / 10000.0
                * (CASE WHEN mean_t < 0 THEN -1.0 WHEN mean_t > 0 THEN 1.0
                        ELSE 0.0 END)) AS mean,
               (CAST(floor(abs(m3 / (m2 * sqrt(m2))) * 10000.0 + 0.5)
                     AS DOUBLE) / 10000.0
                * (CASE WHEN m3 < 0 THEN -1.0 WHEN m3 > 0 THEN 1.0
                        ELSE 0.0 END)) AS skewness,
               (CAST(floor(abs(m4 / (m2 * m2)) * 10000.0 + 0.5)
                     AS DOUBLE) / 10000.0) AS kurtosis
        FROM m
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact higher-moment profiling per event type: mean, skewness
    (m3 / m2^1.5) and kurtosis (m4 / m2^2) from raw power sums — the
    distribution-shape diagnostics a data-quality pass runs beside
    min/max/stddev. Spark's built-in `skewness`/`kurtosis` (like
    DuckDB's) accumulate floats in partition order, so their last ulp
    is partitioning-dependent; here values are quantized to int64
    1e-4 ticks and the power sums S1..S4 are EXACT integers (decimal
    accumulation in Spark, HUGEINT in DuckDB — same integers), making
    every downstream double deterministic. The moment formulas avoid
    `pow` (not correctly-rounded, engine-divergent): m2^1.5 is
    spelled m2*sqrt(m2) — sqrt and * are IEEE-exact operations.

    Scale: ONE map-side-combinable aggregate over the 5-value type
    key; the power sums ride Spark's decimal(38,0) partial
    aggregates. x <= ~3.3e6 ticks, so x^4 <= 1.2e26 and corpus sums
    stay far inside 38 digits."""
    e = load(spark, sf_dir, "events")
    x = (
        F.floor(F.abs(F.col("value")) * 10000.0 + 0.5)
        * F.signum("value")
    ).cast("decimal(12,0)")
    s = (
        e.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("x").cast("double").alias("s1"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("s2"),
            F.sum(F.col("x") * F.col("x") * F.col("x"))
            .cast("double")
            .alias("s3"),
            F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x"))
            .cast("double")
            .alias("s4"),
        )
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s.select(
        "event_type",
        n,
        (s1 / n).alias("mean_t"),
        ((s2 - s1 * s1 / n) / n).alias("m2"),
        (
            (s3 - F.lit(3.0) * s1 * s2 / n + F.lit(2.0) * s1 * s1 * s1 / (n * n))
            / n
        ).alias("m3"),
        (
            (
                s4
                - F.lit(4.0) * s1 * s3 / n
                + F.lit(6.0) * s1 * s1 * s2 / (n * n)
                - F.lit(3.0) * s1 * s1 * s1 * s1 / (n * n * n)
            )
            / n
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        round4det(F.col("mean_t") / 10000.0).alias("mean"),
        round4det(m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        round4det(m4 / (m2 * m2)).alias("kurtosis"),
    )


@REG.register(
    "q_agg_bitmap",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS ndv_users,
               count(*) AS n_events
        FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation
    (`bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg` / `bitmap_count`, Spark 3.5+): each
    (group, 32k-id bucket) builds a fixed-4KB bitmap of the ids it
    saw, and the group's NDV is the sum of per-bucket popcounts —
    buckets partition the id space, so no id is double-counted.

    This is the 100 TB exact-NDV play: `count(DISTINCT x)` plans an
    Expand + re-shuffle of every (group, id) pair and keeps raw ids
    in the agg state; approx_count_distinct bounds the state but
    gives up exactness. Bitmap aggregation keeps BOTH — partial
    aggregates are fixed-size bitmaps merged by OR (map-side
    combinable), the shuffle carries one bitmap per (group, bucket)
    instead of the id stream, and the popcount sum is exact. The
    DuckDB oracle is the plain COUNT(DISTINCT), certifying
    exactness. n_events rides the same pass for free."""
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = (
        e.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("bm"),
            F.count("*").alias("n"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("ndv_users"),
        F.sum("n").alias("n_events"),
    )


@REG.register(
    "q_tpch_q4",
    oracle=f"""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND CAST(l.l_shipdate AS DATE)
                  > CAST(o.o_orderdate AS DATE) + {_LATE_DAYS}
        )
        GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue (order-priority checking): count orders per
    priority that have AT LEAST ONE late line (l_shipdate more than
    45 days after the order date; reference Q4 compares
    l_commitdate < l_receiptdate — absent from this layout, same
    adaptation as q_tpch_q21).

    Plan: the EXISTS decorrelates to a LEFT SEMI join on the order
    key with the lateness predicate as a residual non-equi term —
    one shuffle per side on l_orderkey, then a 5-group
    map-side-combined count. The semi join stops probing an order at
    its first late line (no duplicate-elimination pass, unlike an
    INNER join + distinct)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("odate"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.ship > F.date_add(o.odate, _LATE_DAYS)),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@REG.register(
    "q_tpch_q14",
    oracle=f"""
        WITH j AS (
            SELECT date_trunc('month', l.l_shipdate) AS mon,
                   p.p_type,
                   l.l_extendedprice * (1 - l.l_discount) AS rev
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ), a AS (
            SELECT mon,
                   {oracle_dsum_fixed(
                       "CASE WHEN p_type = 'PROMO' THEN rev ELSE 0.0 END"
                   )} AS promo_rev,
                   {oracle_dsum_fixed("rev")} AS total_rev
            FROM j GROUP BY mon
        )
        SELECT strftime(mon, '%Y-%m') AS mon,
               promo_rev, total_rev,
               {oracle_round4det("100.0 * promo_rev / total_rev")}
                   AS promo_share
        FROM a
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue (promotion effect): per ship month, the
    percentage of revenue from PROMO-type parts — the conditional-
    aggregate ratio composite (reference Q14 restricts to one month;
    here every month reports, which exercises the same plan over more
    groups).

    Plan: the part dim (200 rows, type column only) broadcasts into
    the lineitem scan — the fact table never shuffles for the join;
    the month rollup is one map-side-combined aggregate. Both sums
    ride the fixed-point decimal path and the ratio divides the two
    4dp-exact doubles with the shared floor-round spelling, so the
    percentage is cross-engine deterministic."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("mon"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    a = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("mon")
        .agg(
            dsum_fixed(
                F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                    0.0
                ),
                "promo_rev",
            ),
            dsum_fixed("rev", "total_rev"),
        )
    )
    return a.select(
        F.date_format("mon", "yyyy-MM").alias("mon"),
        "promo_rev",
        "total_rev",
        round4det(
            F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")
        ).alias("promo_share"),
    )


@REG.register(
    "q_tpch_q15",
    oracle="""
        WITH srev AS (
            SELECT l_suppkey,
                   sum(CAST(floor(abs(l_extendedprice * (1 - l_discount))
                                  * 10000.0 + 0.5) AS BIGINT)) AS rev_t
            FROM lineitem GROUP BY l_suppkey
        ), mx AS (
            SELECT max(rev_t) AS m FROM srev
        )
        SELECT s.s_suppkey, s.s_name,
               (CAST(r.rev_t AS DOUBLE) / 10000.0) AS total_revenue
        FROM srev r
        JOIN mx ON r.rev_t = mx.m
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue (top supplier): the supplier(s) whose total
    revenue equals the global maximum — the view + scalar-max
    equality composite (ties all surface, as in the reference).

    Determinism: revenue quantizes to int64 1e-4 ticks at the ROW
    level (revenue is nonnegative, so signum folds away), making both
    the per-supplier sums and the global max exact integers — the
    equality join cannot be flipped by a float ulp in either engine.
    Plan: one l_suppkey rollup shuffle; the 1-row max broadcasts back
    over the tiny per-supplier table; the supplier dim broadcasts."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(
            F.abs(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 10000.0
            + 0.5
        )
        .cast("long")
        .alias("rt"),
    )
    srev = li.groupBy("l_suppkey").agg(F.sum("rt").alias("rev_t"))
    mx = srev.agg(F.max("rev_t").alias("m"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        srev.join(F.broadcast(mx), srev.rev_t == F.col("m"))
        .join(F.broadcast(s), srev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_t").cast("double") / 10000.0).alias(
                "total_revenue"
            ),
        )
    )


@REG.register(
    "q_tpch_q19",
    oracle=f"""
        SELECT count(*) AS n_lines,
               {oracle_dsum_fixed("l_extendedprice * (1 - l_discount)")}
                   AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 25)
           OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10)
           OR (p.p_type = 'ECONOMY' AND p.p_size >= 20
               AND l.l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue (discounted revenue): revenue matching an
    OR-of-conjunctions predicate that mixes part attributes and line
    attributes — the disjunctive-predicate composite that defeats
    naive per-table pushdown (no single conjunct restricts either
    table alone; brand/type/size clauses are adapted to this part
    dim's value domain).

    Plan: the 200-row part dim broadcasts; the mixed OR evaluates as
    ONE codegen'd predicate on the joined row (Catalyst cannot split
    it per table — correct, since each disjunct spans both). The
    1-row global aggregate is map-side combined; no shuffle carries
    more than the post-filter survivors."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & (F.col("p_size") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return j.filter(cond).agg(
        F.count("*").alias("n_lines"),
        dsum_fixed(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )


@REG.register(
    "q_agg_weighted_median",
    oracle="""
        WITH t AS (
            SELECT l_returnflag,
                   CAST(floor(l_extendedprice * 10000.0 + 0.5)
                        AS BIGINT) AS vt,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
            FROM lineitem
        ), c AS (
            SELECT l_returnflag, vt, w,
                   sum(w) OVER (PARTITION BY l_returnflag
                                ORDER BY vt
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
                   sum(w) OVER (PARTITION BY l_returnflag) AS tot
            FROM t
        )
        SELECT l_returnflag,
               CAST(min(tot) AS BIGINT) AS total_weight,
               (CAST(min(CASE WHEN 2 * cum >= tot THEN vt END)
                     AS DOUBLE) / 10000.0) AS wmedian
        FROM c GROUP BY l_returnflag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group: the smallest price whose cumulative
    quantity weight reaches half the group's total — the
    quantity-weighted "typical price" (the op behind importance-
    weighted quantiles in mixture weighting, where neither percentile
    nor mean respects row weights).

    Determinism: prices quantize to int64 1e-4 ticks and weights to
    integers, so the running weight sums are exact and the selection
    predicate `2*cum >= tot` compares exact integers — and although
    each engine may order WITHIN a tie group of equal prices
    differently, the selected price is order-invariant (every row of
    the group carries the same price; the half-mass position falls at
    a fixed total regardless of within-group order — which is also
    exactly why the per-VALUE cumulative below selects the same price
    the oracle's per-row window does).

    Plan (re-planned r6, VERDICT r5 "What's wrong" §2): the old shape
    ran the running weight sum in a window partitioned on the 3-value
    l_returnflag domain over every lineitem row — 3 tasks regardless
    of cluster size. Now the fact table compresses to the (flag,
    price-tick) value domain with map-side-combined weight sums, then
    `grouped_value_cumsum` runs the cumulative over 1e7-tick ($1000)
    buckets with triangular offsets — window partitions bounded by
    the price domain inside one bucket, never by fact rows."""
    from ngram_analytics_spark.operators.valuedomain import (
        grouped_value_cumsum,
    )

    t = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 10000.0 + 0.5)
        .cast("long")
        .alias("vt"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("w"),
    )
    g = t.groupBy("l_returnflag", "vt").agg(F.sum("w").alias("w"))
    c = grouped_value_cumsum(g, "l_returnflag", "vt", "w", 1e7)
    return c.groupBy("l_returnflag").agg(
        F.min("tot").alias("total_weight"),
        (
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("vt")))
            .cast("double")
            / 10000.0
        ).alias("wmedian"),
    )


@REG.register(
    "q_fn_map2",
    oracle="""
        SELECT event_id,
               2 * k + 1 AS doubled_plus,
               'k_' || CAST(k % 10 AS VARCHAR) AS renamed_key,
               CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS n_even,
               11 * k AS zipped_sum,
               2 AS n_concat
        FROM (
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events WHERE props IS NOT NULL
        )
    """,
)
def q_fn_map2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order function family: transform_values /
    transform_keys / map_filter / map_zip_with / map_concat over the
    JSON-parsed props map — the lambda surface for MapType columns
    (sibling of q_fn_map's construction/access family).

    Oracle strategy: DuckDB has no MapType lambdas, so the oracle
    derives every expected output ARITHMETICALLY from the underlying
    json value — certifying the Spark lambdas against independently
    computed results rather than a same-shaped query. All expressions
    are JVM codegen (no UDFs); per-row, shuffle-free.

    NULL contract (tools/null_probe.py): NULL props filtered on BOTH
    engines (the arithmetic oracle renders constants where the Spark
    lambdas propagate NULL).

    spread() (r15): the map HOFs are interpreted, and the single-
    row-group local file ran all of them on ONE scan task (2.8 s of
    the 3.2 s wall at sf0.1, stageprof); the narrow round-robin
    exchange is a no-op on any many-split input and the projection
    is per-row, so values are unchanged."""
    from ngram_analytics_spark.operators import spread

    e = spread(
        load(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select("event_id", "props")
    )
    m = F.from_json("props", "map<string,int>")
    m10 = F.transform_values(m, lambda k, v: v * 10)
    return e.select(
        "event_id",
        F.element_at(
            F.transform_values(m, lambda k, v: v * 2 + 1), "k"
        ).alias("doubled_plus"),
        F.map_keys(
            F.transform_keys(
                m, lambda k, v: F.concat(k, F.lit("_"), (v % 10).cast("string"))
            )
        )[0].alias("renamed_key"),
        F.size(F.map_filter(m, lambda k, v: v % 2 == 0)).alias("n_even"),
        F.element_at(
            F.map_zip_with(m, m10, lambda k, a, b: a + b), "k"
        ).alias("zipped_sum"),
        F.size(
            F.map_concat(m, F.create_map(F.lit("x"), F.lit(1)))
        ).alias("n_concat"),
    )


@REG.register(
    "q_fn_json2",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_tup,
               '{"et":"' || event_type || '","k":'
                   || json_extract_string(props, '$.k') || '}' AS packed,
               3 AS arr_len,
               CAST(json_extract_string(props, '$.k') AS INTEGER) * 100
                   AS arr_first,
               CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
        FROM events WHERE props IS NOT NULL
    """,
)
def q_fn_json2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended JSON scalar family: json_tuple extraction, to_json
    packing (struct -> canonical JSON text), json_array_length /
    get_json_object over a constructed array document, and a
    validity probe — the JSON surface beyond q_fn_map_json's
    path-extraction basics.

    The packed column certifies Spark's to_json field order and
    number formatting against a string the oracle assembles by hand;
    the array columns certify array indexing on a document BUILT
    in-plan (so the oracle can derive the expectations
    arithmetically). All JVM codegen, per-row, shuffle-free.

    NULL contract (tools/null_probe.py): NULL props filtered on BOTH
    engines (Spark to_json still packs the non-props fields of a
    NULL-props row while the hand-assembled oracle string collapses
    to NULL — probed divergent, now aligned)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select("event_id", "event_type", "props")
    )
    # parse the document ONCE (json_tuple generator); every other
    # column derives from the extracted value — the naive spelling
    # (one get_json_object per output column) re-parses the document
    # per expression and measured 1.5x slower per row at sf1.
    tup = e.select(
        "event_id", "event_type", "props", F.json_tuple("props", "k")
    ).withColumnRenamed("c0", "_kt")
    k = F.col("_kt").cast("int")
    arr_doc = F.concat(
        F.lit("["),
        (k * 100).cast("string"),
        F.lit(","),
        (k * 200).cast("string"),
        F.lit(","),
        (k * 300).cast("string"),
        F.lit("]"),
    )
    return tup.select(
        "event_id",
        k.alias("k_tup"),
        F.to_json(
            F.struct(
                F.col("event_type").alias("et"),
                k.alias("k"),
            )
        ).alias("packed"),
        F.json_array_length(arr_doc).alias("arr_len"),
        F.get_json_object(arr_doc, "$[0]").cast("int").alias("arr_first"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


@REG.register(
    "q_fn_str_to_map",
    oracle="""
        SELECT event_id,
               'k=' || json_extract_string(props, '$.k')
                   || ';type=' || event_type AS kv_text,
               CAST(json_extract_string(props, '$.k') AS INTEGER)
                   AS k_back,
               event_type AS type_back,
               2 AS n_entries
        FROM events WHERE props IS NOT NULL
    """,
)
def q_fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map round-trip: a `k=v;k=v` config string is built
    in-plan, parsed back with `str_to_map`, and both entries plus the
    entry count are re-extracted — the parser behind ingesting the
    delimited key-value blobs (user agents, log contexts, legacy
    configs) that predate JSON.

    The oracle never calls a map function (DuckDB has no MapType):
    it re-derives the built string and the expected extractions from
    the underlying columns, certifying Spark's parse against
    independently computed values (the q_fn_map2 discipline).
    Per-row codegen, shuffle-free.

    NULL contract (tools/null_probe.py): NULL props filtered on BOTH
    engines (the NULL-propagating Spark concat vs DuckDB's
    NULL-skipping || diverge on the built string)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select("event_id", "event_type", "props")
    )
    kv_text = F.concat(
        F.lit("k="),
        F.get_json_object("props", "$.k"),
        F.lit(";type="),
        F.col("event_type"),
    )
    m = F.str_to_map(kv_text, F.lit(";"), F.lit("="))
    return e.select(
        "event_id",
        kv_text.alias("kv_text"),
        F.element_at(m, "k").cast("int").alias("k_back"),
        F.element_at(m, "type").alias("type_back"),
        F.size(m).alias("n_entries"),
    )


#: RFM scoring thresholds are dataset-derived quintile boundaries
#: (percentile_disc -> exact data values, engine-safe) broadcast as a
#: 1-row dim; spelled identically in the oracle.
_RFM_QS = (0.2, 0.4, 0.6, 0.8)


@REG.register(
    "q_rfm_segment",
    oracle=f"""
        WITH cust AS (
            SELECT o_custkey,
                   max(CAST(o_orderdate AS DATE)) AS last_d,
                   count(*) AS freq,
                   sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                            AS BIGINT)) AS spend_c
            FROM orders GROUP BY o_custkey
        ), anchor AS (
            SELECT max(last_d) AS today FROM cust
        ), feat AS (
            SELECT o_custkey,
                   (a.today - last_d) AS rec_days,
                   freq, spend_c
            FROM cust CROSS JOIN anchor a
        ), th AS (
            SELECT
                {", ".join(
                    f"quantile_disc(rec_days, {q}) AS r{i}, "
                    f"quantile_disc(freq, {q}) AS f{i}, "
                    f"quantile_disc(spend_c, {q}) AS m{i}"
                    for i, q in enumerate(_RFM_QS, start=1)
                )}
            FROM feat
        ), scored AS (
            SELECT o_custkey,
                   (CASE WHEN rec_days <= r1 THEN 5
                         WHEN rec_days <= r2 THEN 4
                         WHEN rec_days <= r3 THEN 3
                         WHEN rec_days <= r4 THEN 2 ELSE 1 END) AS r,
                   (CASE WHEN freq <= f1 THEN 1
                         WHEN freq <= f2 THEN 2
                         WHEN freq <= f3 THEN 3
                         WHEN freq <= f4 THEN 4 ELSE 5 END) AS f,
                   (CASE WHEN spend_c <= m1 THEN 1
                         WHEN spend_c <= m2 THEN 2
                         WHEN spend_c <= m3 THEN 3
                         WHEN spend_c <= m4 THEN 4 ELSE 5 END) AS m
            FROM feat CROSS JOIN th
        )
        SELECT r, f, m, count(*) AS n_cust,
               min(o_custkey) AS sample_cust
        FROM scored GROUP BY r, f, m
    """,
)
def q_rfm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quintile scores 1-5 per customer, segment census) — the classic
    marketing-analytics composite. Quintile boundaries are
    percentile_disc values (EXACT data points, so both engines bucket
    on identical thresholds — the cont-interpolation midpoint hazard
    from q_anomaly_mad never arises), monetary is exact integer
    cents, recency is integer days from the dataset's own anchor
    (max order date — no wall-clock dependence).

    Plan: one per-customer rollup (custkey exchange), a 1-row anchor
    and a 1-row 12-threshold dim broadcast back, scoring at scan
    stage, and a ≤125-group census — nothing in the plan grows
    faster than the customer rollup at 100 TB."""
    o = load(spark, sf_dir, "orders")
    spend_c = F.sum(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    )
    cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").alias("freq"),
        spend_c.alias("spend_c"),
    )
    anchor = cust.groupBy().agg(F.max("last_d").alias("today"))
    feat = cust.join(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("today", "last_d").cast("long").alias("rec_days"),
        "freq",
        "spend_c",
    )
    th = feat.groupBy().agg(
        *[
            c
            for i, q in enumerate(_RFM_QS, start=1)
            for c in (
                F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY rec_days)").alias(f"r{i}"),
                F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY freq)").alias(f"f{i}"),
                F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY spend_c)").alias(f"m{i}"),
            )
        ]
    )
    s = feat.join(F.broadcast(th))
    r = (
        F.when(F.col("rec_days") <= F.col("r1"), 5)
        .when(F.col("rec_days") <= F.col("r2"), 4)
        .when(F.col("rec_days") <= F.col("r3"), 3)
        .when(F.col("rec_days") <= F.col("r4"), 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("freq") <= F.col("f1"), 1)
        .when(F.col("freq") <= F.col("f2"), 2)
        .when(F.col("freq") <= F.col("f3"), 3)
        .when(F.col("freq") <= F.col("f4"), 4)
        .otherwise(5)
    )
    m = (
        F.when(F.col("spend_c") <= F.col("m1"), 1)
        .when(F.col("spend_c") <= F.col("m2"), 2)
        .when(F.col("spend_c") <= F.col("m3"), 3)
        .when(F.col("spend_c") <= F.col("m4"), 4)
        .otherwise(5)
    )
    return (
        s.select("o_custkey", r.alias("r"), f_.alias("f"), m.alias("m"))
        .groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_cust"),
            F.min("o_custkey").alias("sample_cust"),
        )
    )


@REG.register(
    "q_basket_lift",
    oracle="""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ), n AS (
            SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
        ), bc AS (
            SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand
        ), pairs AS (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   count(*) AS n_ab
            FROM ob a JOIN ob b
              ON a.l_orderkey = b.l_orderkey
             AND a.p_brand < b.p_brand
            GROUP BY a.p_brand, b.p_brand
        )
        SELECT p.brand_a, p.brand_b, p.n_ab,
               CAST(floor(p.n_ab * 1000000.0 / n.n_orders)
                    AS BIGINT) AS support_ppm,
               CAST(floor(CAST(p.n_ab AS DOUBLE) * n.n_orders
                          * 1000000.0 / (ca.n_b * cb.n_b))
                    AS BIGINT) AS lift_ppm
        FROM pairs p
        JOIN bc ca ON p.brand_a = ca.p_brand
        JOIN bc cb ON p.brand_b = cb.p_brand
        CROSS JOIN n
        WHERE p.n_ab >= 5
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: support and lift for brand
    pairs co-purchased within an order (lift = P(a,b)/(P(a)P(b)) —
    >1e6 ppm means the brands attract each other) — the co-occurrence
    analytics a recommender or assortment planner runs, and the
    ITEM-level sibling of q_text_collocation's token-level PMI.

    Plan (r15, VERDICT r14 item 6 — single-reference discipline): the
    r14 shape ran three INDEPENDENT subtrees (pair sets, brand
    marginals, order count), i.e. three lineitem scans, two broadcast
    part joins and five exchanges; checkpointing the shared basket
    table had traded recompute for block churn and was unstable
    (14-122 s across runs). Now ONE basket pass feeds everything:
    each order's brand set emits pair structs, single-brand structs
    AND an order marker from one generator (the set is distinct per
    order, so exploded singles == the old distinct (order, brand)
    rows and markers count orders exactly), one (kind, a, b)
    aggregate counts all three populations, and the brand-domain-
    bounded result (<= |brands|^2/2 + |brands| + 1 rows — the
    valuedomain collect discipline) collapses to one row where
    higher-order filters/map lookups attach marginals and the order
    total without ever re-referencing the basket subtree. ppm
    divisions keep the exact r14 float spellings (same IEEE op
    order); interleaved A/B and 2-SF value identity in the round
    log."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("bs"))
    )
    pair_structs = F.expr(
        "flatten(transform(bs, x ->"
        " transform(filter(bs, y -> y > x),"
        " y -> struct(2 AS kind, x AS a, y AS b))))"
    )
    single_structs = F.expr(
        "transform(bs, x -> struct(1 AS kind, x AS a,"
        " CAST(NULL AS STRING) AS b))"
    )
    marker = F.expr(
        "array(struct(0 AS kind, CAST(NULL AS STRING) AS a,"
        " CAST(NULL AS STRING) AS b))"
    )
    counts = (
        g.select(
            F.explode(
                F.concat(pair_structs, single_structs, marker)
            ).alias("t")
        )
        .groupBy("t.kind", "t.a", "t.b")
        .agg(F.count("*").alias("cnt"))
    )
    one = counts.groupBy().agg(
        F.collect_list(F.struct("kind", "a", "b", "cnt")).alias("cl")
    )
    n_orders = F.element_at(
        F.expr("filter(cl, e -> e.kind = 0)"), 1
    )["cnt"]
    bmap = F.map_from_entries(
        F.expr(
            "transform(filter(cl, e -> e.kind = 1),"
            " e -> struct(e.a, e.cnt))"
        )
    )
    return (
        one.select(
            F.explode(
                F.expr("filter(cl, e -> e.kind = 2 AND e.cnt >= 5)")
            ).alias("pr"),
            n_orders.alias("_n"),
            bmap.alias("_bm"),
        )
        .select(
            F.col("pr.a").alias("brand_a"),
            F.col("pr.b").alias("brand_b"),
            F.col("pr.cnt").alias("n_ab"),
            F.floor(
                F.col("pr.cnt") * F.lit(1000000.0) / F.col("_n")
            )
            .cast("long")
            .alias("support_ppm"),
            F.floor(
                F.col("pr.cnt").cast("double")
                * F.col("_n")
                * F.lit(1000000.0)
                / (
                    F.element_at("_bm", F.col("pr.a"))
                    * F.element_at("_bm", F.col("pr.b"))
                )
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )
