"""Relational coverage, batch 2: distribution windows, percentiles,
statistical moments, argmin/argmax, extended string/conditional/hash
function families. Same conventions as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ngram_analytics_spark.catalog import load
from ngram_analytics_spark.functions.deterministic import (
    oracle_round_det,
    round_det,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()


@REG.register(
    "q_win_distribution",
    oracle=f"""
        SELECT c_custkey,
               {oracle_round_det(
                   "percent_rank() OVER (PARTITION BY c_mktsegment"
                   " ORDER BY c_acctbal ASC, c_custkey ASC)"
               )} AS pct_rank,
               {oracle_round_det(
                   "cume_dist() OVER (PARTITION BY c_mktsegment"
                   " ORDER BY c_acctbal ASC, c_custkey ASC)"
               )} AS cume,
               ntile(10) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
        FROM customer
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    over a fully deterministic (unique-key) ordering.

    Plan (re-planned r6, VERDICT r5 "What's wrong" §2 class): the
    direct spelling windows on the 5-value c_mktsegment domain over
    every customer row — 5 tasks at any scale. Since the full order
    key is unique (custkey tiebreak), all three functions are pure
    formulas of the global rank r and group size n: percent_rank =
    (r-1)/(n-1), cume_dist = r/n, ntile via the SQL-standard
    remainder split. r comes from the q_vocab_coverage bucket-rank
    machinery: row_number within (segment, $500-acctbal-bucket) plus
    per-bucket offsets from a triangular join over the ~22-row bucket
    summary — window partitions bounded by the acctbal domain in one
    bucket, never by customer count."""
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal", "c_custkey"
    )
    vb = c.withColumn(
        "_b", F.floor(F.col("c_acctbal") / F.lit(500.0)).cast("long")
    )
    per_bucket = vb.groupBy("c_mktsegment", "_b").agg(
        F.count("*").alias("_n")
    )
    x, y = per_bucket.alias("x"), per_bucket.alias("y")
    offsets = (
        x.join(
            F.broadcast(y),
            (F.col("y.c_mktsegment") == F.col("x.c_mktsegment"))
            & (F.col("y._b") < F.col("x._b")),
            "left",
        )
        .groupBy(
            F.col("x.c_mktsegment").alias("c_mktsegment"),
            F.col("x._b").alias("_b"),
        )
        .agg(F.coalesce(F.sum("y._n"), F.lit(0)).alias("_off"))
    )
    totals = per_bucket.groupBy("c_mktsegment").agg(
        F.sum("_n").alias("n")
    )
    w = W.partitionBy("c_mktsegment", "_b").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    ranked = (
        vb.withColumn("_r", F.row_number().over(w))
        .join(F.broadcast(offsets), ["c_mktsegment", "_b"])
        .join(F.broadcast(totals), "c_mktsegment")
        .withColumn("r", F.col("_off") + F.col("_r"))
    )
    # NTILE(10) remainder split: the first (n mod 10) tiles hold
    # (n div 10 + 1) rows, the rest (n div 10) — all-integer, so the
    # formula is bit-identical to both engines' native ntile.
    tile_q = F.expr("n div 10")
    rem = F.col("n") % 10
    first_cap = (tile_q + 1) * rem
    return ranked.select(
        "c_custkey",
        round_det(
            F.when(
                F.col("n") > 1,
                (F.col("r") - 1).cast("double") / (F.col("n") - 1),
            ).otherwise(F.lit(0.0))
        ).alias("pct_rank"),
        round_det(F.col("r").cast("double") / F.col("n")).alias("cume"),
        F.when(
            F.col("r") <= first_cap,
            F.expr("(r + (n div 10)) div ((n div 10) + 1)"),
        )
        .otherwise(
            rem
            + F.expr(
                "(r - ((n div 10) + 1) * (n % 10) + (n div 10) - 1)"
                " div (n div 10)"
            )
        )
        .cast("int")
        .alias("decile"),
    )


@REG.register(
    "q_agg_percentile",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_round_det("quantile_cont(l_quantity, 0.5)")} AS median_qty,
               {oracle_round_det("quantile_cont(l_quantity, 0.25)")} AS p25_qty,
               {oracle_round_det("quantile_cont(l_quantity, 0.9)")} AS p90_qty,
               {oracle_round_det("quantile_cont(l_extendedprice, 0.5)")} AS median_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — both engines implement
    SQL-standard percentile_cont positioning (n-1)*p)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_det(F.percentile("l_quantity", F.lit(0.5))).alias("median_qty"),
        round_det(F.percentile("l_quantity", F.lit(0.25))).alias("p25_qty"),
        round_det(F.percentile("l_quantity", F.lit(0.9))).alias("p90_qty"),
        round_det(F.percentile("l_extendedprice", F.lit(0.5))).alias("median_price"),
    )


@REG.register(
    "q_agg_stats",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_round_det("stddev_samp(l_quantity)", 2)} AS sd_qty,
               {oracle_round_det("var_samp(l_quantity)", 2)} AS var_qty,
               {oracle_round_det("corr(l_quantity, l_extendedprice)", 2)} AS corr_qp,
               {oracle_round_det("covar_samp(l_quantity, l_discount)", 2)} AS cov_qd
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments. These are single-pass co-moment updates whose
    accumulation order differs across engines (~1e-12 relative) — rounded
    at 2 decimals so the tolerance dwarfs the order noise."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_det(F.stddev_samp("l_quantity"), 2).alias("sd_qty"),
        round_det(F.var_samp("l_quantity"), 2).alias("var_qty"),
        round_det(F.corr("l_quantity", "l_extendedprice"), 2).alias("corr_qp"),
        round_det(F.covar_samp("l_quantity", "l_discount"), 2).alias("cov_qd"),
    )


@REG.register(
    "q_agg_minmaxby",
    oracle="""
        SELECT o_orderpriority,
               max_by(o_orderkey, o_orderkey) AS latest_key,
               max_by(o_orderstatus, o_orderkey) AS latest_status,
               min_by(o_orderstatus, o_orderkey) AS earliest_status,
               CAST(bit_and(o_orderkey) AS BIGINT) AS keys_and,
               CAST(bit_or(o_orderkey) AS BIGINT) AS keys_or,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS keys_xor
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def q_agg_minmaxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax (min_by/max_by over a UNIQUE ordering key — ties
    would be nondeterministic) + order-independent bitwise aggregates."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("latest_key"),
        F.max_by("o_orderstatus", "o_orderkey").alias("latest_status"),
        F.min_by("o_orderstatus", "o_orderkey").alias("earliest_status"),
        F.bit_and("o_orderkey").alias("keys_and"),
        F.bit_or("o_orderkey").alias("keys_or"),
        F.bit_xor("o_orderkey").alias("keys_xor"),
    )


@REG.register(
    "q_agg_stringagg",
    oracle="""
        SELECT c_nationkey,
               string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey)
                   AS segs_concat
        FROM customer
        GROUP BY c_nationkey
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg); determinism from the
    explicit (value, unique key) sort."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("c_mktsegment", "c_custkey"))
                    ),
                    lambda s: s["c_mktsegment"],
                ),
                "|",
            ).alias("segs_concat")
        )
    )


@REG.register(
    "q_fn_string2",
    oracle="""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS brand_pad,
               rpad(p_type, 10, '.') AS type_pad,
               reverse(p_name) AS name_rev,
               repeat(p_brand, 2) AS brand2,
               left(p_name, 4) AS name_l4,
               right(p_name, 3) AS name_r3,
               CAST(ascii(p_name) AS INTEGER) AS first_code,
               chr(65 + p_size % 26) AS size_chr,
               translate(p_type, 'AEO', 'aeo') AS type_tr,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel
        FROM part
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: pad/reverse/repeat/left/right/ascii/chr/
    translate/regexp_replace."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.rpad("p_type", 10, ".").alias("type_pad"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.substring("p_name", 1, 4).alias("name_l4"),
        F.substring(F.col("p_name"), -3, 3).alias("name_r3"),
        F.ascii("p_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("size_chr"),
        F.translate("p_type", "AEO", "aeo").alias("type_tr"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_novowel"),
    )


@REG.register(
    "q_fn_cond",
    oracle="""
        SELECT s_suppkey,
               greatest(s_acctbal, 1000.0) AS bal_floor,
               least(s_acctbal, 5000.0) AS bal_cap,
               coalesce(nullif(s_name, s_name), 'same') AS nullif_demo,
               CASE WHEN s_acctbal IS NULL THEN -1.0 ELSE s_acctbal END AS bal_nn,
               if(s_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
        FROM supplier
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: greatest/least/nullif/coalesce/if."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest("s_acctbal", F.lit(1000.0)).alias("bal_floor"),
        F.least("s_acctbal", F.lit(5000.0)).alias("bal_cap"),
        F.coalesce(F.nullif("s_name", F.col("s_name")), F.lit("same")).alias(
            "nullif_demo"
        ),
        F.when(F.col("s_acctbal").isNull(), -1.0)
        .otherwise(F.col("s_acctbal"))
        .alias("bal_nn"),
        F.when(F.col("s_nationkey") % 2 == 0, "even")
        .otherwise("odd")
        .alias("nation_parity"),
    )


@REG.register(
    "q_fn_hash",
    oracle="""
        SELECT n_nationkey,
               md5(n_name) AS name_md5,
               sha256(n_name) AS name_sha256,
               md5(concat(n_name, CAST(n_regionkey AS VARCHAR))) AS compound_md5
        FROM nation
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family — md5/sha256 are standards, identical
    across engines (unlike xxhash64/murmur, which stay rows-only)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("name_sha256"),
        F.md5(
            F.concat(F.col("n_name"), F.col("n_regionkey").cast("string")).cast(
                "binary"
            )
        ).alias("compound_md5"),
    )


@REG.register(
    "q_fn_cast",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS INTEGER) AS qty_int,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
               CAST('42' AS INTEGER) + l_linenumber AS plus42,
               CAST(l_linenumber AS DOUBLE) / 2 AS half_line
        FROM lineitem
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/conversion family (int<->string, timestamp->date->string,
    string->int arithmetic)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        (F.lit("42").cast("int") + F.col("l_linenumber")).alias("plus42"),
        (F.col("l_linenumber").cast("double") / 2).alias("half_line"),
    )
