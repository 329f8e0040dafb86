"""TPC-H completion: analogues for the 11 classic decision-support
queries not yet in the suite (Q1, Q2, Q6, Q8, Q9, Q11, Q12, Q13, Q16,
Q17, Q20), adapted to this schema — no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode/l_container, no p_mfgr/p_comment.
Together with relational5/relational6 this covers all 22 TPC-H shapes.

The reference engine has no counterpart (its sole operator is the
n-gram transform, NGramTransform.java:95-134); this is north-star
surface (SURVEY.md §2.B): the canonical scan-heavy rollup (Q1), the
correlated-min lookup (Q2), the tightest filter-agg (Q6), market-share
ratio over a 6-table snowflake (Q8), profit decomposition (Q9),
scalar-subquery threshold (Q11), horizontal bucketing (Q12),
outer-join distribution (Q13), distinct-count exclusion (Q16),
per-group-average gating (Q17), and the quantity-share semi-join (Q20).

Schema adaptations (mirroring the q_tpch_q21 conventions):
- "supply offers" are derived from lineitem: supplier s offers part p
  iff s ever shipped p; offered unit price = min(extendedprice/qty).
- part "cost" (Q9's ps_supplycost) is 60% of p_retailprice.
- ship delay (l_shipdate - o_orderdate) replaces the
  commit/receipt-date lateness and the ship-mode speed classes.
- Q13's comment-pattern exclusion becomes an order-priority exclusion;
  Q16's supplier-complaint exclusion becomes a negative-balance test.

Scale notes: every money aggregate rides the int64 fixed-point path
(dsum_fixed — codegen'd long adds, order-independent); every fact-fact
edge shuffles on its natural key at most once; dims (part 2k, supplier
100, nation 25, region 5 rows — and at SF100k still ≪ the 10M-row
broadcast bound) broadcast; scalar thresholds (Q11 total, Q17 averages,
Q20 part-year totals) are computed as aggregates and re-joined, never
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ngram_analytics_spark.catalog import load
from ngram_analytics_spark.functions.deterministic import (
    _quantized,
    davg_fixed,
    dsum_fixed,
    oracle_davg_fixed,
    oracle_dsum_fixed,
    oracle_round4det,
    round4det,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()

#: Q1's reporting cutoff: lines shipped on/before this date (the
#: reference uses DATE '1998-12-01' - 90 days; this dataset's ship
#: dates span 1995-2001, so the cutoff keeps ~87% of the fact table).
_Q1_CUTOFF = "2001-01-01"

#: Q9's supply-cost analogue: cost fraction of the part list price.
_COST_FRAC = 0.6


@REG.register(
    "q_tpch_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {oracle_dsum_fixed("l_quantity")} AS sum_qty,
               {oracle_dsum_fixed("l_extendedprice")} AS sum_base_price,
               {oracle_dsum_fixed(
                   "l_extendedprice * (1 - l_discount)"
               )} AS sum_disc_price,
               {oracle_dsum_fixed(
                   "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
               )} AS sum_charge,
               {oracle_davg_fixed("l_quantity")} AS avg_qty,
               {oracle_davg_fixed("l_extendedprice")} AS avg_price,
               {oracle_davg_fixed("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '{_Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report), the canonical scan-heavy
    rollup: 8 aggregates over ~all of lineitem grouped into 6
    (returnflag, linestatus) cells.

    Plan: single parquet scan with the date predicate pushed down
    (only the 11 referenced columns read), one map-side-combined
    aggregation into 6 groups — partial state is 6 rows per task, so
    the exchange moves O(tasks) rows regardless of SF; at 100 TB this
    is pure scan bandwidth. All four money sums and three averages
    ride the int64 fixed-point path (order-independent, codegen'd
    long adds — measured ~5x the decimal path on this aggregate)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("date")
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
    "q_tpch_q2",
    oracle=f"""
        WITH offer AS (
            SELECT l_partkey, l_suppkey,
                   {oracle_round4det(
                       "min(l_extendedprice / l_quantity)"
                   )} AS unit_price
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eligible AS (
            SELECT o.l_partkey, o.l_suppkey, o.unit_price
            FROM offer o
            JOIN supplier s ON o.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = (SELECT min(r2.r_name)
                              FROM supplier s2
                              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey)
        ), best AS (
            SELECT l_partkey, min(unit_price) AS best_price
            FROM eligible GROUP BY l_partkey
        )
        SELECT s.s_acctbal, s.s_name, n.n_name,
               p.p_partkey, p.p_brand, p.p_type, e.unit_price
        FROM eligible e
        JOIN best b ON e.l_partkey = b.l_partkey
                   AND e.unit_price = b.best_price
        JOIN part p ON e.l_partkey = p.p_partkey
        JOIN supplier s ON e.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue (minimum-cost supplier): for STANDARD parts
    of size 10-20, every supplier in the lexicographically-first
    region offering the part at that part's regional minimum unit
    price. The reference's correlated MIN(ps_supplycost) subquery
    becomes a per-part min over lineitem-derived offers (no partsupp
    in this layout; offer price = min shipped unit price, rounded 4dp
    so the min-equality join is cross-engine exact).

    Plan: the region prune applies BEFORE the offer aggregation — the
    offer min is keyed by (partkey, suppkey), so filtering suppliers
    commutes with it, and the broadcast semi-join into the lineitem
    scan cuts the aggregation input by the region's supplier share
    (~1/5) before any shuffle. The correlated per-part min is then a
    second small agg plus a same-key join-back (no re-shuffle: both
    sides already cluster on l_partkey). Part dim broadcasts with the
    size/type predicate pushed to its scan."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region")
    sup_geo = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    # first region AMONG regions that have suppliers (data-robust at
    # tiny SF where the lexicographic minimum may be supplier-less)
    first_region = sup_geo.groupBy().agg(F.min("r_name").alias("r_name"))
    sup_in_region = sup_geo.join(
        F.broadcast(first_region), "r_name", "left_semi"
    )
    sup_dim = sup_in_region.select(
        "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    offer = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(
            F.broadcast(sup_dim.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            round4det(
                F.min(F.col("l_extendedprice") / F.col("l_quantity"))
            ).alias("unit_price")
        )
    )
    eligible = offer.join(
        F.broadcast(sup_dim),
        offer.l_suppkey == F.col("s_suppkey"),
    )
    best = eligible.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("best_price")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    )
    return (
        eligible.join(
            best,
            (eligible.l_partkey == best.b_partkey)
            & (eligible.unit_price == best.best_price),
        )
        .join(F.broadcast(p), eligible.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "p_type",
            "unit_price",
        )
    )


@REG.register(
    "q_tpch_q6",
    oracle=f"""
        SELECT {oracle_dsum_fixed(
            "l_extendedprice * l_discount"
        )} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the tightest
    filter-and-aggregate in the suite — revenue that would be gained
    by eliminating small discounts on small-quantity 1998 lines.

    Plan: all three predicates and the 4-column projection push into
    the parquet scan (PushedFilters on shipdate/discount/quantity);
    the global aggregate's partial state is one row per task. At
    100 TB with date-partitioned layout the year predicate prunes
    partitions before any IO — the query is bounded by scanning one
    year of 4 columns, nothing else."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1999-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.groupBy().agg(
        dsum_fixed(
            F.col("l_extendedprice") * F.col("l_discount"), "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@REG.register(
    "q_tpch_q8",
    oracle=f"""
        WITH vol AS (
            SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INT)
                       AS o_year,
                   sn.n_name AS supp_nation,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE r.r_name = (SELECT min(r2.r_name)
                              FROM customer c2
                              JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey
                              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey)
              AND p.p_type = 'ECONOMY'
        )
        SELECT o_year,
               {oracle_dsum_fixed(
                   "CASE WHEN supp_nation = "
                   "(SELECT min(n2.n_name) FROM supplier s2 JOIN nation n2"
                   " ON s2.s_nationkey = n2.n_nationkey) "
                   "THEN volume ELSE 0.0 END"
               )} AS nation_volume,
               {oracle_dsum_fixed("volume")} AS total_volume,
               {oracle_round4det(
                   "(" + oracle_dsum_fixed(
                       "CASE WHEN supp_nation = "
                       "(SELECT min(n2.n_name) FROM supplier s2 JOIN nation n2"
                   " ON s2.s_nationkey = n2.n_nationkey) "
                       "THEN volume ELSE 0.0 END"
                   ) + ") / NULLIF(" + oracle_dsum_fixed("volume") + ", 0)"
               )} AS mkt_share
        FROM vol GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue (national market share): per order year, the
    lexicographically-first nation's share of ECONOMY-part revenue
    sold into the lexicographically-first region — the deepest join
    tree in the suite (lineitem + orders + customer + 2×nation +
    region + supplier + part: 7 relations).

    Plan: the ONLY fact-fact edge is lineitem⋈orders (shuffle on
    orderkey); customer and every dim broadcast — customer filters to
    one region FIRST (nation/region broadcast semi-chain), so the
    orders side entering the fact join is already region-pruned.
    Part's type predicate prunes lineitem via broadcast before the
    shuffle. The share ratio reuses the two fixed-point sums with the
    shared floor-round spelling — cross-engine deterministic."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cust_geo = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # picks are data-robust at tiny SF: first region AMONG regions
    # with customers, first nation AMONG nations with suppliers
    first_region = cust_geo.groupBy().agg(F.min("r_name").alias("fr"))
    first_nation = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy()
        .agg(F.min("n_name").alias("fn"))
    )
    cust = (
        cust_geo.join(
            F.broadcast(first_region),
            F.col("r_name") == F.col("fr"),
            "left_semi",
        )
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey, "left_semi")
        .select(
            "o_orderkey",
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "l_orderkey",
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
    )
    vol = li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
    agg = vol.join(F.broadcast(first_nation)).groupBy("o_year").agg(
        dsum_fixed(
            F.when(
                F.col("supp_nation") == F.col("fn"), F.col("volume")
            ).otherwise(0.0),
            "nation_volume",
        ),
        dsum_fixed("volume", "total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        round4det(
            F.col("nation_volume")
            / F.nullif(F.col("total_volume"), F.lit(0.0))
        ).alias("mkt_share"),
    )


@REG.register(
    "q_tpch_q9",
    oracle=f"""
        WITH profit AS (
            SELECT sn.n_name AS nation,
                   CAST(year(CAST(o.o_orderdate AS DATE)) AS INT)
                       AS o_year,
                   l.l_extendedprice * (1 - l.l_discount)
                     - {_COST_FRAC} * p.p_retailprice * l.l_quantity
                       AS amount
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE '%red%'
        )
        SELECT nation, o_year,
               {oracle_dsum_fixed("amount")} AS sum_profit
        FROM profit GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue (product-type profit): profit on red-named
    parts per supplier nation per order year, where cost is 60% of
    the part list price times quantity (this layout has no
    ps_supplycost — see module docstring).

    Plan: part (name-LIKE pruned, 2 columns) and supplier+nation
    broadcast into the lineitem scan; the one fact-fact edge
    (orders, for the year) shuffles on orderkey with SHUFFLE_HASH
    (both sides large at SF; never broadcastable). Final rollup is
    25 nations × ~7 years — map-side combine collapses to ~175
    partial rows per task."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "l_orderkey",
            "nation",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(_COST_FRAC)
                * F.col("p_retailprice")
                * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(dsum_fixed("amount", "sum_profit"))
    )


@REG.register(
    "q_tpch_q11",
    oracle=f"""
        WITH val AS (
            SELECT l.l_partkey,
                   sum(CAST(floor(abs(
                       l.l_extendedprice * (1 - l.l_discount)
                   ) * 10000.0 + 0.5) AS BIGINT)) AS value_t
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = (SELECT min(n2.n_name)
                              FROM supplier s2
                              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey)
            GROUP BY l.l_partkey
        ), total AS (
            SELECT sum(value_t) AS grand_t FROM val
        )
        SELECT v.l_partkey AS partkey,
               (CAST(v.value_t AS DOUBLE) / 10000.0) AS value
        FROM val v JOIN total t ON v.value_t * 1000 > t.grand_t
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue (important stock identification): parts
    whose traded value through suppliers of the lexicographically-
    first nation exceeds 0.1% of that nation's grand total — the
    scalar-subquery-threshold composite. Value is lineitem revenue
    (no partsupp in this layout).

    Plan: the nation filter broadcasts into the lineitem scan (the
    fact table never shuffles for the join — supplier is 2 columns);
    one shuffle for the per-part agg; the grand total is a 1-row
    aggregate broadcast back. The share predicate compares int64
    tick values (value_t * 1000 > grand_t) — integer arithmetic, no
    float threshold to flip cross-engine (note amounts are positive,
    so the |x| quantization commutes with the sums)."""
    n = load(spark, sf_dir, "nation")
    sup_nat = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    # first nation AMONG nations that have suppliers (data-robust at
    # tiny SF where the lexicographic minimum may be supplier-less)
    first_nation = sup_nat.groupBy().agg(F.min("n_name").alias("fn"))
    sup = (
        sup_nat.join(
            F.broadcast(first_nation),
            F.col("n_name") == F.col("fn"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ticks = (F.floor(F.abs(rev) * 10000.0 + 0.5)).cast("long")
    val = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(ticks).alias("value_t"))
    )
    total = val.groupBy().agg(F.sum("value_t").alias("grand_t"))
    return (
        val.join(
            F.broadcast(total),
            F.col("value_t") * 1000 > F.col("grand_t"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_t").cast("double") / 10000.0).alias("value"),
        )
    )


@REG.register(
    "q_tpch_q12",
    oracle=f"""
        SELECT CASE
                 WHEN CAST(l.l_shipdate AS DATE)
                      <= CAST(o.o_orderdate AS DATE) + 30 THEN 'FAST'
                 WHEN CAST(l.l_shipdate AS DATE)
                      <= CAST(o.o_orderdate AS DATE) + 60 THEN 'MEDIUM'
                 ELSE 'SLOW'
               END AS ship_class,
               CAST(sum(CASE WHEN o.o_orderpriority
                                  IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority
                                  NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= DATE '1999-01-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '2000-01-01'
        GROUP BY ship_class
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue (shipping-speed / order-priority): per
    ship-speed class (days from order to ship: ≤30 FAST, ≤60 MEDIUM,
    else SLOW — this layout has no l_shipmode; the speed class plays
    its role), how many 1999-shipped lines belong to high- vs
    low-priority orders — the reference's conditional-count pair
    verbatim.

    Plan: the year predicate pushes into the lineitem scan; the one
    fact-fact join shuffles both sides on orderkey (SHUFFLE_HASH —
    orders is 1/4 of lineitem, never broadcastable at SF); 3-group
    conditional counts are pure map-side combine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1999-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("2000-01-01").cast("date"))
    ).select("l_orderkey", F.to_date("l_shipdate").alias("ship"))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("odate"),
        "o_orderpriority",
    )
    j = li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(
            F.when(
                F.col("ship") <= F.date_add(F.col("odate"), 30), "FAST"
            )
            .when(F.col("ship") <= F.date_add(F.col("odate"), 60), "MEDIUM")
            .otherwise("SLOW")
            .alias("ship_class"),
            high.alias("high"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
    )


@REG.register(
    "q_tpch_q13",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue (customer order-count distribution): how
    many customers placed 0, 1, 2, … qualifying orders — the
    outer-join histogram. The reference excludes orders whose comment
    matches '%special%requests%'; this layout has no o_comment, so
    the exclusion is the '4-NOT SPECIFIED' priority class (same plan
    shape: a non-join predicate that must live INSIDE the left join's
    ON clause, not a post-filter — else 0-count customers vanish).

    Plan: aggregate BEFORE the outer join — orders pre-filters
    (predicate pushed to its scan), collapses to one (custkey, count)
    row per customer on its own custkey exchange, and only THEN left
    joins; coalesce(count, 0) preserves the 0 bucket exactly like
    counting o_orderkey matches. The join therefore moves one row per
    customer instead of one row per order — at 10x data this rewrote
    a 9.0x scale ratio down to the join's natural growth (the naive
    join-then-count spelling shuffled the full order table through
    the outer join and re-shuffled it for the count). The second
    aggregation input is one row per customer, grouped into ~30
    buckets."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    per_key = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_cust = c.join(
        per_key, c.c_custkey == per_key.o_custkey, "left"
    ).select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@REG.register(
    "q_tpch_q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#11'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue (parts/supplier relationship): distinct
    suppliers that ship each qualifying (brand, type, size) part
    class, excluding one brand, the PROMO type, and "complaint"
    suppliers (reference: comment LIKE '%Customer%Complaints%'; this
    layout's analogue is a negative account balance). Supplier-part
    relationships derive from lineitem (no partsupp).

    Plan: part (triple-pruned at its scan) broadcasts into lineitem;
    the complaint exclusion is a broadcast ANTI join (NOT IN over a
    provably non-null key column decorrelates to anti); distinct
    suppliers per class = one (class, suppkey) dedup agg then a
    count — both land on the same shuffle key chain, and map-side
    partial dedup shrinks the exchange to unique pairs."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_sup = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@REG.register(
    "q_tpch_q17",
    oracle=f"""
        WITH avg_qty AS (
            SELECT l_partkey,
                   (0.5 * {oracle_davg_fixed("l_quantity")}) AS half_avg
            FROM lineitem GROUP BY l_partkey
        )
        SELECT {oracle_round4det(
            "(" + oracle_dsum_fixed("l.l_extendedprice") + ") / 7.0"
        )} AS avg_yearly,
               count(*) AS n_small_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN avg_qty a ON l.l_partkey = a.l_partkey
        WHERE p.p_brand = 'Brand#13' AND p.p_type = 'SMALL'
          AND l.l_quantity < a.half_avg
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue (small-quantity-order revenue): yearly
    revenue lost if Brand#13 SMALL-type parts stopped shipping in
    quantities below half the part's average quantity — the
    correlated per-group-average gate (reference: 20% of avg and one
    container; this layout has no l_container, so the type stands
    in and the fraction is one-half).

    Plan: the correlated AVG decorrelates to a per-part aggregate
    joined back on partkey. The per-part average is independent
    across parts, so the part-dim gate (broadcast semi) prunes BOTH
    the aggregate's input and the probe side before any shuffle —
    ungated parts' averages can never surface in the result, and at
    ~0.7% part selectivity the join-back moves 1/150th of the fact
    table (the unpruned spelling scaled 2.8x for 10x data; this one
    rides the pruned row count). Both sides then cluster on
    l_partkey, so the join-back adds no exchange beyond the agg's
    own. The half-average rides the fixed-point path (int64 tick sum,
    order-free, tie-safe 4dp round, exact *0.5) so the strict `<`
    gate compares identical doubles cross-engine even for
    non-integral quantities."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        # fixed-point avg (int64 tick sum, order-free) then exact *0.5:
        # plain avg()'s double summation is order-dependent and the
        # strict < gate below would flip on non-integral quantities
        (F.lit(0.5) * davg_fixed("l_quantity")).alias("half_avg")
    )
    small = li.join(
        avg_qty, F.col("l_partkey") == F.col("a_partkey")
    ).filter(F.col("l_quantity") < F.col("half_avg"))
    return small.groupBy().agg(
        round4det(
            dsum_fixed("l_extendedprice").cast("double") / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count("*").alias("n_small_lines"),
    )


@REG.register(
    "q_tpch_q20",
    oracle="""
        WITH red_parts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        ), shipped AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(floor(l_quantity) AS BIGINT)) AS qty
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '2001-01-01'
              AND l_partkey IN (SELECT p_partkey FROM red_parts)
            GROUP BY l_partkey, l_suppkey
        ), part_total AS (
            SELECT l_partkey, sum(qty) AS total_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT DISTINCT s.s_suppkey, s.s_name, s.s_acctbal
        FROM shipped sh
        JOIN part_total pt ON sh.l_partkey = pt.l_partkey
        JOIN supplier s ON sh.l_suppkey = s.s_suppkey
        WHERE sh.qty * 10 > pt.total_qty * 3
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue (potential part promotion): suppliers that
    shipped more than 30% of any red-prefixed part's total year-2000
    volume — the quantity-share semi-join chain (reference: availqty
    > half the year's shipments per part-supp, via partsupp; this
    layout derives supplier-part volume from lineitem itself).

    Plan: red-part set broadcasts as a semi-join into the
    date-pruned lineitem scan; per-(part, supp) quantities and
    per-part totals share one l_partkey exchange chain (partition
    keys ⊆ grouping keys — the q_tpch_q21 subset-clustering
    discipline), so the share join-back is exchange-free; the share
    gate is integer cross-multiplication (qty*10 > total*3 — whole
    quantities, no float boundary). DISTINCT collapses a supplier
    qualifying via several parts; supplier dim broadcasts last."""
    red = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.to_date("l_shipdate") >= F.lit("2000-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("2001-01-01").cast("date"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == red.p_partkey, "left_semi")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        # explicit floor BEFORE the cast on BOTH sides: DuckDB
        # CAST(double AS BIGINT) ROUNDS while Spark cast("long")
        # TRUNCATES — identical only because floor() commutes
        F.sum(F.floor("l_quantity").cast("long")).alias("qty")
    )
    part_total = shipped.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg(F.sum("qty").alias("total_qty"))
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        shipped.join(part_total, shipped.l_partkey == part_total.t_partkey)
        .filter(F.col("qty") * 10 > F.col("total_qty") * 3)
        .join(F.broadcast(s), shipped.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )


@REG.register(
    "q_skyline_pareto",
    oracle="""
        WITH g AS (
            SELECT l_returnflag,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                   min(CAST(floor(l_extendedprice * 100.0 + 0.5)
                            AS BIGINT)) AS best_ct,
                   count(*) AS n_lines
            FROM lineitem GROUP BY l_returnflag,
                                   CAST(floor(l_quantity + 0.5) AS BIGINT)
        ), r AS (
            SELECT l_returnflag, qty, best_ct, n_lines,
                   min(best_ct) OVER (PARTITION BY l_returnflag
                                      ORDER BY qty
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) AS prior_ct
            FROM g
        )
        SELECT l_returnflag, qty,
               (CAST(best_ct AS DOUBLE) / 100.0) AS best_price,
               CAST(n_lines AS BIGINT) AS n_lines
        FROM r WHERE prior_ct IS NULL OR best_ct < prior_ct
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) per group: the quantity levels
    whose best price beats EVERY smaller quantity's best price — the
    dominance query behind "more for less" offer mining and
    multi-objective config search (no point on the frontier is beaten
    on both axes).

    Plan: the naive skyline is a quadratic dominance anti-join; in 2-D
    it collapses to a running MIN over the x-axis VALUE DOMAIN — so
    the fact table first compresses to (group, quantity) best-price
    cells (map-side combined; the value-domain discipline of
    operators/valuedomain.py), and the exclusive running min runs over
    that ~50-row-per-group domain table, never over fact rows.

    Determinism: prices quantize to integer cents BEFORE the min, so
    every comparison is exact int64; frontier membership (strict <
    against the exclusive prior min) is tie-stable — equal-price ties
    keep only the smallest quantity."""
    from pyspark.sql.window import Window as W

    g = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast(
                    "long"
                )
            ).alias("best_ct"),
            F.count("*").alias("n_lines"),
        )
    )
    w = (
        W.partitionBy("l_returnflag")
        .orderBy("qty")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = g.withColumn("prior_ct", F.min("best_ct").over(w))
    return r.filter(
        F.col("prior_ct").isNull() | (F.col("best_ct") < F.col("prior_ct"))
    ).select(
        "l_returnflag",
        "qty",
        (F.col("best_ct").cast("double") / F.lit(100.0)).alias(
            "best_price"
        ),
        "n_lines",
    )


# ------------------------------------------- Pareto revenue concentration

#: spend-tick bucket for the value-domain running sums (cents)
_PARETO_BUCKET = 1e7


@REG.register(
    "q_pareto_share",
    oracle="""
        WITH s AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(abs(o_totalprice) * 100.0 + 0.5)
                                 AS BIGINT)
                            * (CASE WHEN o_totalprice < 0 THEN -1
                                    WHEN o_totalprice > 0 THEN 1
                                    ELSE 0 END)) AS BIGINT) AS v
            FROM orders GROUP BY o_custkey
        ), vc AS (
            SELECT v, CAST(count(*) AS BIGINT) AS c,
                   CAST(v * count(*) AS BIGINT) AS rev
            FROM s GROUP BY v
        ), cum AS (
            SELECT v, c, rev,
                   SUM(c) OVER (ORDER BY v) AS cum_c,
                   SUM(rev) OVER (ORDER BY v) AS cum_rev,
                   SUM(c) OVER () AS n,
                   SUM(rev) OVER () AS tot
            FROM vc
        ), k AS (
            SELECT v, c, rev, cum_c, cum_rev, n, tot,
                   greatest(n // 10, 1) AS kk,
                   (tot + 1) // 2 AS half,
                   n - cum_c + c AS cnt_ge,
                   n - cum_c AS cnt_gt,
                   tot - cum_rev + rev AS rev_ge,
                   tot - cum_rev AS rev_gt
            FROM cum
        )
        SELECT CAST(min(n) AS BIGINT) AS n_customers,
               CAST(min(tot) AS BIGINT) AS total_cents,
               CAST(min(kk) AS BIGINT) AS top_decile_k,
               CAST(min(CASE WHEN cnt_ge >= kk AND cnt_gt < kk
                             THEN cnt_ge END) AS BIGINT) AS top_cnt,
               CAST(floor(min(CASE WHEN cnt_ge >= kk AND cnt_gt < kk
                                   THEN rev_ge END)
                          * 1000000.0 / min(tot)) AS BIGINT)
                   AS top_share_ppm,
               CAST(min(CASE WHEN rev_gt < half AND rev_ge >= half
                                  AND v > 0
                             THEN cnt_gt + (half - rev_gt + v - 1) // v
                             END) AS BIGINT) AS n_half
        FROM k
    """,
)
def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue-concentration readout over per-customer
    spend: the share of total revenue held by the top decile of
    customers, and the minimum number of customers that covers half
    of all revenue — the concentration statistics a sampling/mix
    planner reads next to q_corpus_gini's token-mass inequality and
    q_skew_profile's key-skew census.

    Everything is exact int64 arithmetic on the spend VALUE domain:
    per-customer spend compresses to (spend, customer-count) rows, the
    running masses ride grouped_value_cumsum (window partitions
    bounded by the cent domain inside one bucket), and both rank
    selections are interval hits on the cumulative masses — the top-
    decile boundary row is the unique value with count-above >= K and
    strictly-above < K; the half-coverage row is the unique value
    whose revenue interval contains (tot+1)//2, with the within-tie
    remainder an exact ceiling division (every tied customer
    contributes exactly v cents).

    Plan: one custkey-keyed agg (map-side combined), one value-domain
    compress, the triangular-offset cumsum, ONE final single-row agg.
    No per-row ranks, no unpartitioned windows, nothing driver-side.
    At 100 TB the only fact-width shuffle is the custkey agg."""
    from ngram_analytics_spark.operators.valuedomain import (
        grouped_value_cumsum,
    )

    o = load(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(_quantized(F.col("o_totalprice"), 100.0)).alias("v")
    )
    vc = s.groupBy("v").agg(F.count("*").alias("c")).select(
        F.lit(0).alias("g"),
        "v",
        "c",
        (F.col("v") * F.col("c")).alias("rev"),
    )
    cum = grouped_value_cumsum(vc, "g", "v", ["c", "rev"], _PARETO_BUCKET)
    kk = F.greatest(
        F.expr("tot_c div 10").cast("long"), F.lit(1).cast("long")
    )
    half = F.expr("(tot_rev + 1) div 2")
    cnt_ge = F.col("tot_c") - F.col("cum_c") + F.col("c")
    cnt_gt = F.col("tot_c") - F.col("cum_c")
    rev_ge = F.col("tot_rev") - F.col("cum_rev") + F.col("rev")
    rev_gt = F.col("tot_rev") - F.col("cum_rev")
    top_row = (cnt_ge >= kk) & (cnt_gt < kk)
    half_row = (rev_gt < half) & (rev_ge >= half) & (F.col("v") > 0)
    n50 = cnt_gt + F.expr(
        "((tot_rev + 1) div 2 - (tot_rev - cum_rev) + v - 1) div v"
    )
    return cum.agg(
        F.min("tot_c").cast("long").alias("n_customers"),
        F.min("tot_rev").cast("long").alias("total_cents"),
        F.min(kk).cast("long").alias("top_decile_k"),
        F.min(F.when(top_row, cnt_ge)).cast("long").alias("top_cnt"),
        F.floor(
            F.min(F.when(top_row, rev_ge))
            * F.lit(1_000_000.0)
            / F.min("tot_rev")
        )
        .cast("long")
        .alias("top_share_ppm"),
        F.min(F.when(half_row, n50)).cast("long").alias("n_half"),
    )
