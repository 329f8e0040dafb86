"""Training-data pipeline composites beyond dedup/similarity: eval-set
decontamination, repetition-quality signals, deterministic stratified
sampling, sequence packing, and exercisable source-format round-trips.

These are the operations a 100 TB pretraining pipeline runs between
raw crawl and tokenizer — each one a first-class graded query with a
DuckDB oracle twin. No counterpart exists in the reference (its sole
operator is the n-gram transform, NGramTransform.java:95-134); this is
north-star surface (SURVEY.md §2.B, LLM-data-pipeline family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ngram_analytics_spark.catalog import load
from ngram_analytics_spark.functions.deterministic import (
    dsum_fixed,
    oracle_dsum_fixed,
    oracle_round4det,
    round4det,
)
from ngram_analytics_spark.operators.ngram import (
    ngram_col,
    ngram_explode,
    ngrams_sql,
)
from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()

TOKENS = "string_split(text, ' ')"

# decontamination: n-gram size / eval-split modulus. 4-grams over a
# ~1% eval split give a small-but-nonzero contaminated set on the
# synthetic corpus (8 train docs at sf0.01), mirroring the exact
# n-gram-overlap decontamination reported for GPT-3/Llama training.
_DECON_N = 4
_DECON_MOD = 97


@REG.register(
    "q_decontam",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, g
            FROM (
                SELECT doc_id, unnest({ngrams_sql(TOKENS, _DECON_N)}) AS g
                FROM documents
            )
        ), eval_sh AS (
            SELECT DISTINCT g FROM sh WHERE doc_id % {_DECON_MOD} = 0
        ), hits AS (
            SELECT s.doc_id, count(DISTINCT s.g) AS n_hits
            FROM sh s JOIN eval_sh e ON s.g = e.g
            WHERE s.doc_id % {_DECON_MOD} != 0
            GROUP BY s.doc_id
        )
        SELECT d.doc_id, d.lang,
               COALESCE(h.n_hits, 0) AS n_hits,
               CASE WHEN h.n_hits IS NOT NULL THEN 1 ELSE 0 END
                   AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % {_DECON_MOD} != 0
    """,
)
def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag every TRAIN document sharing any
    {n}-gram with the (held-out) EVAL split — the exact-substring
    overlap check every serious pretraining run performs against its
    benchmark suites before training.

    Scale shape: both sides reduce to (doc_id, shingle) and meet in ONE
    equi-join on the shingle; the eval side (benchmark suites are tiny
    relative to a crawl) is broadcast, so the train corpus never
    shuffles. Zero-hit docs are restored by a left join against the
    (already loaded) documents scan.
    """
    from ngram_analytics_spark.operators import spread

    d = load(spark, sf_dir, "documents")
    # spread + explode_outer (r6 discipline): the single-row-group scan
    # plus explode's inferred size() filter otherwise evaluates the
    # 4-gram lambda per consumer on ONE task (2.1 -> 0.9 s at sf0.1)
    # tokenizer hoisted to its own projection (longdoc probe r9):
    # split() as the lambda's array argument re-evaluates per element
    sh = ngram_explode(
        spread(d).select("doc_id", F.split("text", " ").alias("toks")),
        "toks",
        _DECON_N,
        out_col="g",
        keep=["doc_id"],
    )
    is_eval = F.col("doc_id") % _DECON_MOD == 0
    eval_sh = sh.filter(is_eval).select("g").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )
    return (
        d.filter(~is_eval)
        .join(hits.withColumnRenamed("doc_id", "_hid"),
              F.col("doc_id") == F.col("_hid"), "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(F.col("n_hits").isNotNull(), 1).otherwise(0).alias(
                "contaminated"
            ),
        )
    )


@REG.register(
    "q_text_repetition",
    oracle=f"""
        WITH bi AS (
            SELECT doc_id, unnest({ngrams_sql(TOKENS, 2)}) AS g
            FROM documents
        ), per AS (
            SELECT doc_id, g, count(*) AS c
            FROM bi GROUP BY doc_id, g
        )
        SELECT p.doc_id,
               CAST(sum(p.c) AS BIGINT) AS n_bigrams,
               CAST(max(p.c) AS BIGINT) AS top_bigram_n,
               {oracle_round4det(
                   "CAST(max(p.c) AS DOUBLE) / sum(p.c)"
               )} AS top_bigram_frac,
               {oracle_round4det(
                   "CAST(count(*) AS DOUBLE) / sum(p.c)"
               )} AS distinct_bigram_ratio
        FROM per p
        GROUP BY p.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality signals (the MassiveText/Gopher repetition
    rules): per document, the most-frequent-bigram mass fraction and
    the distinct-bigram ratio — high top-fraction / low distinct-ratio
    marks boilerplate and degenerate repetition for filtering.

    Plan: one explode + two map-side-combined aggregations, both keyed
    by doc_id (the second reuses the first's partitioning — no extra
    shuffle). Docs with <2 tokens have no bigrams and drop out, same
    as the oracle's unnest of an empty list."""
    d = load(spark, sf_dir, "documents")
    # tokenizer hoisted to its own projection (longdoc probe r9:
    # 54.7x at equal token mass with split() inside the lambda)
    per = (
        ngram_explode(
            d.select("doc_id", F.split("text", " ").alias("toks")),
            "toks",
            2,
            out_col="g",
            keep=["doc_id"],
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
        round4det(F.max("c").cast("double") / F.sum("c")).alias(
            "top_bigram_frac"
        ),
        round4det(F.count("*").cast("double") / F.sum("c")).alias(
            "distinct_bigram_ratio"
        ),
    )


@REG.register(
    "q_sample_stratified",
    oracle=f"""
        WITH counts AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ), rates AS (
            SELECT lang, n,
                   CAST((SELECT min(n) FROM counts) AS DOUBLE) / n AS rate
            FROM counts
        )
        SELECT d.lang,
               count(*) AS n_kept,
               CAST(min(r.n) AS BIGINT) AS n_lang,
               {oracle_round4det("min(r.rate)")} AS rate
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
              < printf('%08x', CAST(least(floor(r.rate * 4294967296.0),
                                          4294967295.0) AS BIGINT))
        GROUP BY d.lang
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (language-balanced) sampling — the data
    MIXING step of corpus assembly: every language downsampled to the
    rarest language's expected size via an md5-threshold Bernoulli
    keyed on doc_id.

    Cross-engine reproducible BY CONSTRUCTION (md5 prefix vs a
    per-stratum hex threshold string — both fixed-width lowercase hex,
    so lexicographic compare == numeric compare), unlike df.sample()
    whose output depends on partition layout. The per-lang rate table
    is a broadcast 1-row-per-stratum dim; the corpus is filtered in
    the scan stage and shuffles only for the final per-lang count."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("_min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        "n",
        (F.col("_min_n").cast("double") / F.col("n")).alias("rate"),
    )
    thresh = F.format_string(
        "%08x",
        F.least(
            F.floor(F.col("rate") * F.lit(4294967296.0)).cast("double"),
            F.lit(4294967295.0),
        ).cast("bigint"),
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
            < thresh
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n").alias("n_lang"),
            round4det(F.min("rate")).alias("rate"),
        )
    )


#: token budget per training pack (tiny on purpose: synthetic docs are
#: 10-100 tokens, so packs hold a handful of docs like real 2k-8k-token
#: packs hold a handful of documents)
_PACK_BUDGET = 256


@REG.register(
    "q_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, len({TOKENS}) AS n_tok
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ), cum AS (
            SELECT doc_id, lang, n_tok,
                   sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS c
            FROM toks
        )
        SELECT lang,
               CAST((c - n_tok) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        FROM cum
        GROUP BY lang, pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id
    order, per language) to fixed-token-budget training packs by
    running-cumsum bucketing — pack_id = tokens-before-me div budget,
    the contiguous-fill packing every pretraining dataloader performs.

    Plan (re-planned r6, VERDICT r5 "What's wrong" §2 class): the old
    shape ran ONE running-sum window per lang (~6 partitions) over
    every document. Now `grouped_ordered_cumsum` buckets doc_ids into
    4096-wide ranges, runs the running sum within (lang, bucket) —
    partition size bounded by the bucket width — and adds per-bucket
    offsets from a running sum over the compressed bucket summary
    (#rows = #buckets, recursion-ready if that ever matters). Then one
    map-side-combined aggregation on (lang, pack_id)."""
    from ngram_analytics_spark.operators.valuedomain import (
        grouped_ordered_cumsum,
    )

    # NULL contract (tools/null_probe.py): NULL text packs nothing and
    # packing is per-lang, so NULL-lang docs route through a langid
    # pass first — both filtered on BOTH engines (a NULL n_tok
    # otherwise poisons the running cumsum for every later doc in the
    # lang, and NULL lang keys fall out of the bucket-offset
    # equi-join on one engine only).
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select(
            "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
        )
    )
    cum = grouped_ordered_cumsum(d, "lang", "doc_id", "n_tok", 4096)
    return (
        cum.withColumnRenamed("cum", "c")
        .withColumn(
            "pack_id",
            F.expr(f"(c - n_tok) div {_PACK_BUDGET}"),
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
    )


# ---------------------------------------------------- source round-trips
#
# The lakehouse connectors (Delta/Iceberg/Avro) are capability-gated in
# sources/__init__.py because their jars are absent here; CSV, JSON and
# ORC are built into Spark, so those sources are exercised END TO END:
# write the table out in the format, read it back with an explicit
# schema (never inference — schema drift at 100 TB must fail loudly,
# not silently retype), and aggregate. The oracle reads the original
# parquet: a round-trip that loses type or value fidelity hash-fails.


def _roundtrip_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    base = os.path.join(
        "/tmp",
        "nas_src_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
        fmt,
    )
    return base


@REG.register(
    "q_source_csv",
    oracle=f"""
        SELECT n.n_name, count(*) AS n_cust,
               {oracle_dsum_fixed("c.c_acctbal", 2)} AS bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink round-trip: customer written as headered CSV,
    read back with an EXPLICIT schema (inference is a silent-retype
    hazard), joined to the broadcast nation dim and aggregated.
    Balances are compared in exact integer cents — if CSV float
    formatting lost a digit anywhere, the hash gate catches it."""
    out = _roundtrip_dir(spark, sf_dir, "csv")
    c = load(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    schema = (
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string"
    )
    back = spark.read.schema(schema).option("header", True).csv(out)
    n = load(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(n), back.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            dsum_fixed("c_acctbal", "bal", digits=2),
        )
    )


@REG.register(
    "q_source_json",
    oracle=f"""
        SELECT o_orderpriority, count(*) AS n,
               {oracle_dsum_fixed("o_totalprice", 2)} AS price,
               min(strftime(o_orderdate, '%Y-%m-%d')) AS first_date
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round-trip on a filtered orders slice —
    timestamps survive as ISO strings and are re-parsed by the explicit
    read schema; exact integer-cents totals pin value fidelity."""
    out = _roundtrip_dir(spark, sf_dir, "json")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    o.write.mode("overwrite").json(out)
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string"
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum_fixed("o_totalprice", "price", digits=2),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "first_date"
        ),
    )


@REG.register(
    "q_source_orc",
    oracle=f"""
        SELECT s_nationkey, count(*) AS n_supp,
               {oracle_dsum_fixed("s_acctbal", 2)} AS bal
        FROM supplier GROUP BY s_nationkey
    """,
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip (the other columnar format Spark
    ships natively): supplier written and re-read as ORC, aggregated
    per nation in exact integer cents."""
    out = _roundtrip_dir(spark, sf_dir, "orc")
    s = load(spark, sf_dir, "supplier")
    s.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        dsum_fixed("s_acctbal", "bal", digits=2),
    )


@REG.register(
    "q_dedup_incremental",
    oracle="""
        WITH newb AS (
            SELECT doc_id, lang, sha256(lower(trim(text))) AS h
            FROM documents WHERE doc_id % 7 = 0
        ), corpus AS (
            SELECT DISTINCT sha256(lower(trim(text))) AS h
            FROM documents WHERE doc_id % 7 != 0
        ), cls AS (
            SELECT n.lang,
                   CASE WHEN c.h IS NOT NULL THEN 2
                        WHEN row_number() OVER (
                            PARTITION BY n.h ORDER BY n.doc_id
                        ) > 1 THEN 1
                        ELSE 0 END AS cls
            FROM newb n LEFT JOIN corpus c ON n.h = c.h
        )
        SELECT lang,
               count(*) AS n_new,
               CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_corpus,
               CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_within
        FROM cls GROUP BY lang
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: a NEW batch of documents (doc_id %
    7 == 0, the q_cdc_diff split convention) deduplicated against the
    EXISTING corpus without re-touching corpus rows — the shape every
    continuously-fed training pipeline runs on each drop of data,
    where re-deduplicating 100 TB from scratch per batch is not an
    option. A new doc is dropped if its normalized-text hash already
    exists in the corpus (one distinct-project of the corpus + one
    hash-key join — the corpus side never carries text, only 32-byte
    hashes), else if an earlier new doc in the same batch shares the
    hash (keep-first within batch, q_dedup_exact semantics). Both
    decisions key the shuffle on the hash, so the plan is two
    hash-partitioned exchanges regardless of corpus size; per-language
    counts certify the classification against the SQL oracle."""
    d = load(spark, sf_dir, "documents")
    h = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    newb = d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", "lang", h.alias("h")
    )
    corpus = (
        d.filter(F.col("doc_id") % 7 != 0).select(h.alias("h")).distinct()
    )
    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    cls = (
        newb.join(corpus.withColumn("_hit", F.lit(1)), "h", "left")
        .withColumn("_rn", rn)
        .select(
            "lang",
            F.when(F.col("_hit").isNotNull(), 2)
            .when(F.col("_rn") > 1, 1)
            .otherwise(0)
            .alias("cls"),
        )
    )
    return cls.groupBy("lang").agg(
        F.count("*").alias("n_new"),
        F.sum(F.when(F.col("cls") == 0, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("cls") == 2, 1).otherwise(0)).alias(
            "n_dup_corpus"
        ),
        F.sum(F.when(F.col("cls") == 1, 1).otherwise(0)).alias(
            "n_dup_within"
        ),
    )


@REG.register(
    "q_ngram_novelty",
    oracle=f"""
        WITH ref AS (
            SELECT DISTINCT g AS ng
            FROM documents, UNNEST({ngrams_sql(TOKENS, 2)}) AS t(g)
            WHERE doc_id % 5 != 0
        ), newg AS (
            SELECT doc_id, g AS ng
            FROM (
                SELECT doc_id,
                       list_distinct({ngrams_sql(TOKENS, 2)}) AS gs
                FROM documents WHERE doc_id % 5 = 0
            ), UNNEST(gs) AS t(g)
        )
        SELECT n.doc_id,
               count(*) AS n_bigrams,
               CAST(sum(CASE WHEN r.ng IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               {oracle_round4det(
                   "CAST(sum(CASE WHEN r.ng IS NULL THEN 1 ELSE 0 END)"
                   " AS DOUBLE) / count(*)"
               )} AS novelty
        FROM newg n LEFT JOIN ref r ON n.ng = r.ng
        GROUP BY n.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus n-gram NOVELTY scoring: for each incoming document
    (doc_id % 5 == 0), the fraction of its distinct bigrams never seen
    in the reference corpus (the rest of the table) — the
    contribution-vs-redundancy signal a data-mixing pipeline uses to
    prioritize genuinely new text (complement of q_decontam, which
    flags OVERLAP with an eval set; docs whose every bigram is known
    add little). Zero-bigram docs (single-token) drop out of the
    explode, matching the oracle's inner UNNEST.

    Plan shape: reference bigrams reduce to a DISTINCT hash-key set
    (never carrying doc ids), incoming docs explode their distinct
    bigrams, and one left join on the bigram key marks novelty — all
    shuffles key on the bigram, so the plan is two hash exchanges
    regardless of corpus size, the q_dedup_incremental discipline at
    n-gram granularity."""
    from ngram_analytics_spark.operators import spread

    # spread + explode_outer (r6 discipline): the single-row-group scan
    # plus explode's inferred filter otherwise evaluates the bigram
    # lambda twice on one task (ref + incoming branches)
    # tokenizer hoisted to its own projection (longdoc probe r9)
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = F.array_distinct(ngram_col("toks", 2))
    ref = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(F.explode_outer(grams).alias("ng"))
        .filter(F.col("ng").isNotNull())
        .distinct()
    )
    newg = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.explode_outer(grams).alias("ng"))
        .filter(F.col("ng").isNotNull())
    )
    joined = newg.join(
        ref.withColumn("_hit", F.lit(1)), "ng", "left"
    )
    novel = F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        novel.alias("n_novel"),
        round4det(novel.cast("double") / F.count("*")).alias("novelty"),
    )


@REG.register(
    "q_sink_dynamic_overwrite",
    oracle=f"""
        SELECT o_orderpriority, count(*) AS n,
               {oracle_dsum_fixed(
                   "CASE WHEN o_orderpriority = '1-URGENT' "
                   "THEN o_totalprice * 2.0 ELSE o_totalprice END", 2
               )} AS price
        FROM orders GROUP BY o_orderpriority
    """,
)
def q_sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite (INSERT OVERWRITE ... PARTITION
    semantics): the orders table is laid out hive-partitioned by
    priority, then a corrected feed for ONE partition (urgent orders,
    prices restated 2x) is written with
    `partitionOverwriteMode=dynamic` — replacing ONLY the partitions
    present in the incoming frame and leaving the other four
    untouched. This is the lakehouse backfill primitive: reprocess
    one day/partition without rewriting (or even listing) the rest
    of a 100 TB table; static overwrite mode would have dropped the
    other partitions.

    The read-back aggregate certifies both halves — untouched
    partitions hash against the original rows, the restated one
    against the 2x oracle — in exact integer cents. The mode is a
    per-WRITE option (no session-level conf mutation)."""
    out = _roundtrip_dir(spark, sf_dir, "dynpart")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # baseline layout: full static overwrite, hive-partitioned
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    # corrected feed for the urgent partition only
    fix = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2.0
    )
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    # explicit schema: an EMPTY source writes no data files and
    # inference would fail where the contract answer is an empty
    # frame (empty-probe r11)
    back = spark.read.schema(o.schema).parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum_fixed("o_totalprice", "price", digits=2),
    )


#: keyset pagination: page size and the page to fetch (1-indexed).
_PAGE_SIZE = 100
_PAGE_NO = 3


@REG.register(
    "q_paginate_keyset",
    oracle=f"""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders
        ORDER BY o_orderdate ASC, o_orderkey ASC
        LIMIT {_PAGE_SIZE} OFFSET {(_PAGE_NO - 1) * _PAGE_SIZE}
    """,
)
def q_paginate_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: fetch page 3 of the
    (o_orderdate, o_orderkey)-ordered order list WITHOUT an OFFSET
    scan. The boundary key — the last key of page 2 — comes from a
    TakeOrderedAndProject top-(2*pagesize) (distributed top-k: each
    partition keeps 200 rows, the driver merges 200*n_partitions
    candidates, never a global sort), broadcast as a 1-row scalar;
    the page itself is a pushdown-friendly `key > boundary` filter +
    top-pagesize. At 100 TB OFFSET N ORDER BY pays the full top-N
    materialization ON EVERY PAGE — keyset keeps page cost flat in
    the page number, which is why every large-scale API paginates by
    cursor. The oracle is the literal OFFSET spelling."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
    )
    k = F.concat(
        F.lpad(F.unix_date(F.col("od")).cast("string"), 12, "0"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    keyed = o.withColumn("_key", k)
    boundary = (
        keyed.orderBy("_key")
        .limit(_PAGE_SIZE * (_PAGE_NO - 1))
        .agg(F.max("_key").alias("_b"))
    )
    page = (
        keyed.join(F.broadcast(boundary))
        .filter(F.col("_key") > F.col("_b"))
        .orderBy("_key")
        .limit(_PAGE_SIZE)
    )
    return page.select(
        "o_orderkey", F.date_format("od", "yyyy-MM-dd").alias("o_date")
    )


# end-to-end funnel: quality window + lexical-diversity floor, then
# exact dedup keep-first, then eval-split decontamination (same
# 4-gram/modulus constants as q_decontam).
_E2E_MIN_TOK = 20
_E2E_MAX_TOK = 90
_E2E_UNIQ = 0.2


@REG.register(
    "q_pipeline_e2e",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   len({TOKENS}) AS n_tok,
                   CAST(len(list_distinct({TOKENS})) AS DOUBLE)
                       / len({TOKENS}) AS uniq_ratio,
                   (doc_id % {_DECON_MOD} = 0) AS is_eval
            FROM documents
        ), flagged AS (
            SELECT *,
                   (NOT is_eval) AS s_train,
                   (NOT is_eval
                    AND n_tok BETWEEN {_E2E_MIN_TOK} AND {_E2E_MAX_TOK}
                    AND uniq_ratio >= {_E2E_UNIQ}) AS s_quality
            FROM base
        ), keeper AS (
            SELECT doc_id,
                   (doc_id = min(doc_id) OVER (
                        PARTITION BY sha256(lower(trim(text))))) AS first_copy
            FROM flagged WHERE s_quality
        ), sh AS (
            SELECT doc_id, unnest({ngrams_sql(TOKENS, _DECON_N)}) AS g
            FROM documents
        ), eval_sh AS (
            SELECT DISTINCT g FROM sh WHERE doc_id % {_DECON_MOD} = 0
        ), contaminated AS (
            SELECT DISTINCT s.doc_id
            FROM sh s JOIN eval_sh e ON s.g = e.g
            WHERE s.doc_id % {_DECON_MOD} != 0
        ), staged AS (
            SELECT f.lang, f.n_tok, f.s_train, f.s_quality,
                   (f.s_quality AND COALESCE(k.first_copy, FALSE))
                       AS s_unique,
                   (f.s_quality AND COALESCE(k.first_copy, FALSE)
                    AND c.doc_id IS NULL) AS s_clean
            FROM flagged f
            LEFT JOIN keeper k ON f.doc_id = k.doc_id
            LEFT JOIN contaminated c ON f.doc_id = c.doc_id
        )
        SELECT lang,
               count(*) AS n_total,
               count(*) FILTER (WHERE s_train) AS n_train,
               count(*) FILTER (WHERE s_quality) AS n_quality,
               count(*) FILTER (WHERE s_unique) AS n_unique,
               count(*) FILTER (WHERE s_clean) AS n_clean,
               CAST(COALESCE(sum(n_tok) FILTER (WHERE s_clean), 0)
                    AS BIGINT) AS clean_tokens
        FROM staged GROUP BY lang
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus-prep funnel: the survival report a full
    pretraining data pipeline emits per language — raw corpus ->
    eval-split holdout -> quality screen (token-count window +
    lexical-diversity floor, the q_text_quality screen) -> exact
    dedup keep-first (q_dedup_exact semantics, computed AMONG quality
    survivors so an earlier dropped copy cannot shadow a surviving
    one) -> eval decontamination (any shared 4-gram with the holdout,
    q_decontam semantics) -> final kept-token yield. This certifies
    that the individually-graded stages COMPOSE: each stage's
    predicate is evaluated over the previous stage's survivor set,
    not independently.

    Scale shape: one documents scan computes every per-doc flag at
    scan stage; the dedup keeper is ONE window over the
    normalized-hash key (only quality survivors shuffle); the
    decontamination side is the q_decontam broadcast (eval shingles
    are tiny vs the crawl, so the train corpus never shuffles for
    it); the funnel report is one map-side-combined aggregation on
    lang. Three narrow joins back on doc_id ride broadcast at test SF
    and hash-partition cleanly at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    is_eval = F.col("doc_id") % _DECON_MOD == 0
    flagged = d.select(
        "doc_id",
        "lang",
        "text",
        n_tok.alias("n_tok"),
        (~is_eval).alias("s_train"),
        (
            ~is_eval
            & n_tok.between(_E2E_MIN_TOK, _E2E_MAX_TOK)
            & (uniq_ratio >= _E2E_UNIQ)
        ).alias("s_quality"),
    )
    keeper = (
        flagged.filter("s_quality")
        .select(
            F.col("doc_id").alias("_kid"),
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    W.partitionBy(F.sha2(F.lower(F.trim("text")), 256))
                )
            ).alias("first_copy"),
        )
    )
    from ngram_analytics_spark.operators import spread

    # spread + explode_outer (r6 discipline — same fix as q_decontam):
    # two consumers each ran the 4-gram lambda on the single scan task
    # tokenizer hoisted (longdoc probe r9 — same fix as q_decontam)
    sh = ngram_explode(
        spread(d).select("doc_id", F.split("text", " ").alias("toks")),
        "toks",
        _DECON_N,
        out_col="g",
        keep=["doc_id"],
    )
    eval_sh = sh.filter(F.col("doc_id") % _DECON_MOD == 0).select("g").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(eval_sh), "g")
        .select(F.col("doc_id").alias("_cid"))
        .distinct()
    )
    staged = (
        flagged.join(keeper, F.col("doc_id") == F.col("_kid"), "left")
        .join(contaminated, F.col("doc_id") == F.col("_cid"), "left")
        .select(
            "lang",
            "n_tok",
            "s_train",
            "s_quality",
            (
                F.col("s_quality") & F.coalesce("first_copy", F.lit(False))
            ).alias("s_unique"),
            (
                F.col("s_quality")
                & F.coalesce("first_copy", F.lit(False))
                & F.col("_cid").isNull()
            ).alias("s_clean"),
        )
    )
    return staged.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("s_train"), 1)).alias("n_train"),
        F.count(F.when(F.col("s_quality"), 1)).alias("n_quality"),
        F.count(F.when(F.col("s_unique"), 1)).alias("n_unique"),
        F.count(F.when(F.col("s_clean"), 1)).alias("n_clean"),
        F.coalesce(
            F.sum(F.when(F.col("s_clean"), F.col("n_tok"))), F.lit(0)
        ).cast("long").alias("clean_tokens"),
    )


@REG.register(
    "q_source_xml",
    oracle=f"""
        SELECT s.s_nationkey, count(*) AS n_supp,
               {oracle_dsum_fixed("s.s_acctbal", 2)} AS bal
        FROM supplier s
        GROUP BY s.s_nationkey
    """,
)
def q_source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink round-trip (Spark 4 native XML data source —
    no external spark-xml package): supplier written with a rowTag,
    read back with an EXPLICIT schema (same silent-retype discipline
    as q_source_csv), then aggregated per nation with balances in
    exact signed integer cents — if XML text formatting lost a digit
    or re-typed a column, the hash gate catches it.

    Scale shape: XML is a line-less nested format, but Spark's reader
    still splits files and parses rows distributed; the aggregation
    is the usual map-side-combined rollup. Writers shard per task
    exactly like csv/json — no driver funnel."""
    out = _roundtrip_dir(spark, sf_dir, "xml")
    s = load(spark, sf_dir, "supplier")
    s.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(
        out
    )
    schema = (
        "s_suppkey bigint, s_name string, s_nationkey int,"
        " s_acctbal double"
    )
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "supplier")
        .load(out)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        dsum_fixed("s_acctbal", "bal", digits=2),
    )


# ------------------------------------------------------ length bucketing

_LB_BATCH = 64   # sequences per inference micro-batch
_LB_SHARDS = 8   # parallel assignment shards per bucket (scale knob)
_LB_CASE = (
    "CASE WHEN tok <= 16 THEN 16 WHEN tok <= 32 THEN 32 "
    "WHEN tok <= 64 THEN 64 WHEN tok <= 128 THEN 128 "
    "WHEN tok <= 256 THEN 256 WHEN tok <= 512 THEN 512 "
    "ELSE 1024 END"
)


@REG.register(
    "q_length_buckets",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
            FROM documents
        ), b AS (
            SELECT doc_id, tok, {_LB_CASE} AS bucket,
                   doc_id % {_LB_SHARDS} AS shard
            FROM t
        )
        SELECT bucket, shard,
               count(*) AS n_docs,
               (count(*) + {_LB_BATCH - 1}) // {_LB_BATCH} AS n_batches,
               count(*) - ((count(*) - 1) // {_LB_BATCH}) * {_LB_BATCH}
                   AS last_fill,
               CAST(sum(tok) AS BIGINT) AS total_toks,
               CAST(max(tok) * count(*) - sum(tok) AS BIGINT) AS pad_waste
        FROM b
        GROUP BY bucket, shard
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning for inference/training: documents
    land in power-of-two token buckets (16..1024) and a deterministic
    shard (doc_id mod {_LB_SHARDS}), and each (bucket, shard) cell
    reports its micro-batch census — batch count at {_LB_BATCH}
    sequences/batch, last-batch fill, and the padding waste an
    equal-length batcher saves (pad-to-bucket-max minus actual
    tokens). The bucket ladder is an integer CASE (no log2 — banned
    transcendental, FIXTURES.md).

    Batch ids are assigned per (bucket, shard), NOT per bucket: a
    bucket-partitioned window would concentrate each bucket on one
    task at 100 TB (the unpartitioned-window hazard, just coarser);
    sharding bounds every cell and the shard count is the scale knob.
    Plan: one scan, one map-side-combined aggregate on (bucket,
    shard) — the census needs no window at all."""
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("tok"),
    )
    b = t.select(
        "doc_id",
        "tok",
        F.expr(_LB_CASE).alias("bucket"),
        (F.col("doc_id") % _LB_SHARDS).alias("shard"),
    )
    n = F.count("*")
    # integer `div` (exact), matching the oracle's `//` — a double
    # division + cast("long") truncates the correctly-ROUNDED quotient,
    # which can differ from the true floor near exact integers (the
    # q_tpch_q20 spell-it-identically convention, ADVICE r5 sweep)
    return b.groupBy("bucket", "shard").agg(
        n.alias("n_docs"),
        F.expr(
            f"(count(*) + {_LB_BATCH - 1}) div {_LB_BATCH}"
        ).alias("n_batches"),
        F.expr(
            f"count(*) - ((count(*) - 1) div {_LB_BATCH}) * {_LB_BATCH}"
        ).alias("last_fill"),
        F.sum("tok").alias("total_toks"),
        (F.max("tok") * n - F.sum("tok")).alias("pad_waste"),
    )


@REG.register(
    "q_source_text",
    oracle=f"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CAST(len({TOKENS}) AS BIGINT)) AS BIGINT)
                   AS n_toks,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents
        WHERE lang IS NOT NULL AND text IS NOT NULL
    GROUP BY lang
    """,
)
def q_source_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source/sink round-trip: documents exported as tab-keyed
    plain text lines (`lang\\tdoc_id\\ttext` — the classic corpus dump
    format), read back with `spark.read.text` and re-parsed by
    position. The per-lang token/char rollup must hash-match the
    original parquet — if newline handling, delimiter collision, or
    encoding lost a byte anywhere, the gate catches it. n_chars is
    recomputed from the round-tripped text (length), not carried.

    Text is the one format with NO schema in the file: the parse
    contract lives entirely in the reader (everything after the second
    tab is text, so embedded tabs survive), which is exactly the
    hazard the graded round-trip pins. Embedded NEWLINES cannot
    survive a line-oriented dump at all — `read.text` would split the
    row — so the writer raises on them instead of silently corrupting
    (ADVICE r5: the old split_part parse also truncated tab-bearing
    text; both invariants are now explicit).

    NULL contract (tools/null_probe.py): a line-oriented dump has no
    NULL representation — concat_ws silently DROPS a NULL field and
    shifts every later one (the probe read doc_ids back as langs), so
    NULL lang/text rows are excluded from the dump on BOTH engines,
    the third explicit invariant of this format."""
    out = _roundtrip_dir(spark, sf_dir, "text")
    d = load(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    (
        d.select(
            F.when(
                F.col("text").contains("\n") | F.col("text").contains("\r"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "q_source_text: document text contains a "
                            "newline and cannot round-trip a "
                            "line-oriented dump (doc_id "
                        ),
                        F.col("doc_id").cast("string"),
                        F.lit(")"),
                    )
                ),
            )
            .otherwise(
                F.concat_ws(
                    "\t",
                    F.col("lang"),
                    F.col("doc_id").cast("string"),
                    F.col("text"),
                )
            )
            .alias("value")
        )
        .write.mode("overwrite")
        .text(out)
    )
    raw = spark.read.text(out)
    back = raw.select(
        F.substring_index(F.col("value"), "\t", 1).alias("lang"),
        F.expr(
            "substring(value,"
            " locate('\\t', value, locate('\\t', value) + 1) + 1)"
        ).alias("text"),
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_toks"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
    )


# ------------------------------------------------ certified Bloom filter

#: Bloom geometry: 2^18 bits as 8192 x 32-bit words (32-bit masks keep
#: every shift/OR in positive int64 range on both engines), 3 probe
#: positions per key drawn from chunks of ONE md5 digest (the
#: q_dedup_minhash_exact chunking discipline), over 4-gram shingles
#: (bigrams nearly close over the synthetic vocabulary — everything
#: would be a true member). At sf0.01's ~20k reference shingles the
#: fill is ~20% -> ~1% theoretical fp over ~4k true-negative probes;
#: the QUERY certifies the realized rate exactly, including the
#: honest degradation as the fixed filter saturates at larger sf.
_BLOOM_BITS = 262144
_BLOOM_WORD = 32
_BLOOM_K = 3
_BLOOM_N = 4


def _bloom_pos_sql(j: int) -> str:
    return (
        f"(CAST('0x' || substring(md5(bg), {1 + 8 * j}, 8) AS BIGINT)"
        f" % {_BLOOM_BITS})"
    )


@REG.register(
    "q_sketch_bloom_exact",
    oracle=f"""
        WITH ref AS (
            SELECT DISTINCT unnest({ngrams_sql(TOKENS, _BLOOM_N)}) AS bg
            FROM documents WHERE doc_id % 5 != 0
        ), probe AS (
            SELECT DISTINCT unnest({ngrams_sql(TOKENS, _BLOOM_N)}) AS bg
            FROM documents WHERE doc_id % 5 = 0
        ), ref_pos AS (
            SELECT p.j,
                   CASE p.j {" ".join(
                       f"WHEN {j} THEN {_bloom_pos_sql(j)}"
                       for j in range(_BLOOM_K)
                   )} END AS pos
            FROM ref CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) p
        ), bloom AS (
            SELECT pos // {_BLOOM_WORD} AS word,
                   bit_or(CAST(1 AS BIGINT) << (pos % {_BLOOM_WORD}))
                       AS bw
            FROM ref_pos GROUP BY pos // {_BLOOM_WORD}
        ), probe_pos AS (
            SELECT bg, p.j,
                   CASE p.j {" ".join(
                       f"WHEN {j} THEN {_bloom_pos_sql(j)}"
                       for j in range(_BLOOM_K)
                   )} END AS pos
            FROM probe CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) p
        ), hits AS (
            SELECT pp.bg,
                   bool_and(b.bw IS NOT NULL AND
                            (b.bw & (CAST(1 AS BIGINT)
                                     << (pp.pos % {_BLOOM_WORD})))
                            = (CAST(1 AS BIGINT)
                               << (pp.pos % {_BLOOM_WORD}))) AS hit
            FROM probe_pos pp
            LEFT JOIN bloom b ON pp.pos // {_BLOOM_WORD} = b.word
            GROUP BY pp.bg
        ), flagged AS (
            SELECT h.bg, h.hit, r.bg IS NOT NULL AS in_ref
            FROM hits h LEFT JOIN ref r ON h.bg = r.bg
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM ref) AS n_ref,
               CAST(count(*) AS BIGINT) AS n_probe,
               CAST(sum(CASE WHEN in_ref THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_in_ref,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
               CAST(sum(CASE WHEN hit AND NOT in_ref THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos,
               CAST(floor(sum(CASE WHEN hit AND NOT in_ref
                              THEN 1 ELSE 0 END) * 1000000.0
                          / NULLIF(sum(CASE WHEN NOT in_ref
                                       THEN 1 ELSE 0 END), 0))
                    AS BIGINT) AS fp_ppm
        FROM flagged
    """,
)
def q_sketch_bloom_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified Bloom-filter membership: build a 2^18-bit Bloom over
    the reference corpus' distinct 4-grams (doc_id % 5 != 0, the
    q_ngram_novelty split), probe the incoming corpus' bigrams, and
    report the EXACT realized false-positive census (every hit is
    re-checked against true membership) — the sketch a decontamination
    / incremental-dedup pass ships to executors when the reference key
    set is too large to broadcast exactly, here with its error fully
    hash-certified (the q_dedup_minhash_exact discipline applied to
    the sketch family: q_sketch_countmin stays rows-only because
    xxhash64 is Spark-specific; md5 chunks are not).

    Plan: the bloom AGGREGATE is <=8192 rows (bit_or map-side combined —
    constant-size state like q_agg_bitmap) and broadcasts into the
    probe join; true-membership recheck is one bigram-keyed left join.
    At scale the bloom build shuffles 128 words regardless of corpus
    size; only the distinct-bigram sets scale with data.

    Determinism: positions are md5-chunk integers mod 4096; masks are
    32-bit (positive int64 everywhere); bit_or/bool_and are
    order-free."""
    from ngram_analytics_spark.operators import spread

    # spread + explode_outer (r6 discipline): the documents scan is one
    # row group and plain explode's inferred filter would evaluate the
    # 4-gram lambda below the exchange on that single task
    # tokenizer hoisted to its own projection (longdoc probe r9)
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = F.array_distinct(ngram_col("toks", _BLOOM_N))
    ref = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(F.explode_outer(grams).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .distinct()
    )
    probe = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(F.explode_outer(grams).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .distinct()
    )

    def pos(j):
        return (
            F.conv(F.substring(F.md5("bg"), 1 + 8 * j, 8), 16, 10).cast(
                "long"
            )
            % _BLOOM_BITS
        )

    def positions(df):
        return df.select(
            "bg",
            F.explode(F.array(*[pos(j) for j in range(_BLOOM_K)])).alias(
                "pos"
            ),
        )

    # F.shiftleft requires a literal shift count; SQL form takes a column
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
    )
    # integer `div` (the q_length_buckets convention): a double
    # division + cast("long") happens to agree here (pos >= 0, n/32
    # exact in binary) but violates the repo's floor-spelling sweep
    word = F.expr(f"pos div {_BLOOM_WORD}").alias("word")
    bloom = (
        positions(ref)
        .select(word, mask.alias("m"))
        .groupBy("word")
        .agg(F.bit_or("m").alias("bw"))
    )
    hits = (
        positions(probe)
        .select("bg", word, mask.alias("m"))
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("bg")
        .agg(
            F.bool_and(
                F.col("bw").isNotNull()
                & ((F.col("bw").bitwiseAND(F.col("m"))) == F.col("m"))
            ).alias("hit")
        )
    )
    flagged = hits.join(
        ref.select(F.col("bg"), F.lit(True).alias("in_ref")), "bg", "left"
    ).select("hit", F.coalesce("in_ref", F.lit(False)).alias("in_ref"))
    n_ref = ref.agg(F.count("*").alias("n_ref"))
    fp = F.sum(F.when(F.col("hit") & ~F.col("in_ref"), 1).otherwise(0))
    miss = F.sum(F.when(~F.col("in_ref"), 1).otherwise(0))
    return (
        flagged.agg(
            F.count("*").alias("n_probe"),
            F.sum(F.when(F.col("in_ref"), 1).otherwise(0)).alias(
                "n_in_ref"
            ),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hits"),
            fp.alias("n_false_pos"),
            F.when(
                miss > 0, F.floor(fp * F.lit(1_000_000.0) / miss)
            )
            .cast("long")
            .alias("fp_ppm"),
        )
        .crossJoin(F.broadcast(n_ref))
        .select(
            "n_ref", "n_probe", "n_in_ref", "n_hits", "n_false_pos",
            "fp_ppm",
        )
    )


# ------------------------------------------------ BPE pair-count scan

#: Top-K adjacent-symbol pairs reported by the BPE merge scan.
_BPE_TOPK = 50


@REG.register(
    "q_bpe_pair_counts",
    oracle=f"""
        WITH w AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest({TOKENS}) AS tok FROM documents)
            WHERE tok != ''
            GROUP BY tok
        ), p AS (
            -- correlated unnest: i spans 1..length(tok)-1 PER TOKEN
            -- (no fixed upper bound — a range(1, 1000) cross join
            -- would silently drop pairs past position 999 of a long
            -- token while the Spark side's sequence() is unbounded;
            -- ADVICE r7 item 1)
            SELECT substring(tok, i, 2) AS pair, cnt
            FROM (
                SELECT tok, cnt, unnest(range(1, length(tok))) AS i
                FROM w
            )
        )
        SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
        FROM p GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT {_BPE_TOPK}
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training merge scan: count adjacent character pairs
    across the corpus, weighted by word frequency — the statistic the
    tokenizer trainer maximizes at every merge step (Sennrich et al.,
    the algorithm behind GPT/Llama vocabularies). Top-50 pairs with
    exact corpus-wide counts.

    Scale plan — the classic BPE-trainer trick, distributed: aggregate
    to DISTINCT words first (one map-side-combined shuffle on the
    token; at 100 TB the distinct vocabulary is orders of magnitude
    smaller than the token stream), then run the O(word-length) char
    -pair explode over the VOCABULARY only, carrying each word's count
    as the weight. The pair agg is map-side combined on a <=
    |alphabet|^2 key domain, and the top-50 is a TakeOrdered — no
    full sort. A naive per-token explode would shuffle the whole
    corpus character stream instead.

    Determinism: integer counts only; ties in the top-50 break on the
    pair string (both engines compare UTF-8 binary here: pairs are
    drawn from the synthetic corpus' ASCII token alphabet)."""
    from ngram_analytics_spark.operators import spread

    toks = (
        spread(load(spark, sf_dir, "documents"))
        .select(F.explode_outer(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # length >= 2 BEFORE the sequence lambda: Spark's sequence(1, 0)
    # on a 1-char token yields a DESCENDING [1, 0] (not empty like
    # DuckDB's range), fabricating 1-char "pairs"
    pairs = (
        vocab.filter(F.length("tok") >= 2)
        .select(
            "cnt",
            # substring(tok, i, 2) needs a COLUMN start: expr form
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, length(tok) - 1),"
                    " i -> substring(tok, i, 2))"
                )
            ).alias("pair"),
        )
        .filter(F.col("pair").isNotNull())
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(_BPE_TOPK)
    )


# ------------------------------------------- binary source round-trip

#: every 17th document is exported as a standalone payload file
_BIN_MOD = 17


@REG.register(
    "q_source_binary",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS digest
        FROM documents
        WHERE doc_id % {_BIN_MOD} = 0 AND text IS NOT NULL
        ORDER BY doc_id
    """,
)
def q_source_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary source/sink round-trip over Spark's `binaryFile` format —
    the ingestion path for opaque multimodal payloads (images, audio;
    operators/multimodal.py consumes exactly this shape). Every 17th
    document's UTF-8 bytes are exported as one standalone `.bin` file
    by the EXECUTORS (foreachPartition — a distributed payload export,
    no driver materialization), read back via
    `spark.read.format("binaryFile")`, and the per-file byte length +
    md5 digest must hash-match digests recomputed from the source
    table — any byte lost or reordered in either direction trips the
    gate.

    Scale: the export parallelizes per partition (at 100 TB this is
    the payload-extraction job writing to object storage); binaryFile
    reads are split per file with pushed path filters. The comparison
    aggregate is one scan each side.

    Determinism: md5 over UTF-8 bytes is bit-identical in both engines
    (Spark hashes the binary content; DuckDB hashes the VARCHAR's
    UTF-8 encoding — same bytes by construction)."""
    import shutil

    out = _roundtrip_dir(spark, sf_dir, "binary")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # NULL contract (tools/null_probe.py): a payload export has no
    # file to write for an absent payload — filtered on BOTH engines.
    sel = (
        load(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % _BIN_MOD == 0)
            & F.col("text").isNotNull()
        )
        .select("doc_id", "text")
    )

    def write_part(rows):
        for r in rows:
            path = os.path.join(out, f"doc_{r.doc_id:010d}.bin")
            with open(path, "wb") as f:
                f.write(r.text.encode("utf-8"))

    sel.foreachPartition(write_part)
    back = spark.read.format("binaryFile").load(out)
    return (
        back.select(
            F.regexp_extract(
                F.col("path"), r"doc_(\d+)\.bin$", 1
            )
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("byte_len"),
            F.md5("content").alias("digest"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------- deterministic MLM masking

#: every token whose (doc_id, position) hash lands on 0 mod 7 is
#: masked (~14% corruption, the BERT/T5 band)
_CLOZE_MOD = 7
_CLOZE_TOKEN = "<mask>"


@REG.register(
    "q_text_cloze",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {TOKENS} AS toks FROM documents
            WHERE text IS NOT NULL
        ), m AS (
            SELECT doc_id, toks,
                   list_transform(
                       range(1, len(toks) + 1),
                       i -> CAST('0x' || substring(
                               md5(CAST(doc_id AS VARCHAR) || ':'
                                   || CAST(i AS VARCHAR)), 1, 8)
                            AS BIGINT) % {_CLOZE_MOD} = 0
                   ) AS mask
            FROM t
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(range(1, len(toks) + 1),
                                    i -> mask[i])) AS BIGINT)
                   AS n_masked,
               array_to_string(
                   list_transform(range(1, len(toks) + 1),
                       i -> CASE WHEN mask[i] THEN '{_CLOZE_TOKEN}'
                                 ELSE toks[i] END), ' ') AS input_text,
               COALESCE(array_to_string(
                   list_transform(
                       list_filter(range(1, len(toks) + 1),
                                   i -> mask[i]),
                       i -> toks[i]), ' '), '') AS target_text
        FROM m
    """,
)
def q_text_cloze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic masked-language-model corruption (BERT/T5-style
    data prep): every token whose (doc_id, position) md5 lands on
    0 mod {m} is replaced by the mask sentinel in the input and
    collected in order as the prediction target — the final transform
    a denoising-pretraining pipeline applies before packing
    (q_pack_sequences) and sharding (q_shard_assign).

    Cross-engine reproducible BY CONSTRUCTION: masking decisions ride
    the md5-prefix integer (bit-identical both engines), so the exact
    same positions mask everywhere — unlike RNG-based corruption,
    which can never be re-derived for audit. Per-row lambda only, zero
    shuffles — embarrassingly parallel at any corpus size.

    The position lambda indexes `sequence(1, n_tokens)`; split() never
    returns an empty array (even '' tokenizes to ['']) so the
    sequence(1, 0) descending hazard cannot arise here."""
    from ngram_analytics_spark.operators import spread

    # tokenizer hoisted to its own projection (longdoc probe r9:
    # 25.9x at equal token mass): element_at(split(text), i) in the
    # transform lambdas re-ran the split once per ELEMENT; as a
    # projected column (referenced 4x — CollapseProject keeps it) the
    # lambdas index the materialized array in O(1)
    toks = F.col("toks")
    idx = F.sequence(F.lit(1), F.size(toks))
    is_masked = (
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CLOZE_MOD
        == 0
    )
    masked_idx = F.filter(idx, is_masked)
    # NULL contract (tools/null_probe.py): NULL text = nothing to
    # corrupt — filtered on BOTH engines.
    return (
        spread(load(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(masked_idx).cast("long").alias("n_masked"),
        F.array_join(
            F.transform(
                idx,
                lambda i: F.when(
                    is_masked(i), F.lit(_CLOZE_TOKEN)
                ).otherwise(F.element_at(toks, i)),
            ),
            " ",
        ).alias("input_text"),
        F.array_join(
            F.transform(masked_idx, lambda i: F.element_at(toks, i)),
            " ",
        ).alias("target_text"),
        )
    )


q_text_cloze.__doc__ = q_text_cloze.__doc__.format(m=_CLOZE_MOD)


# --------------------------------------------- schema-evolution read

@REG.register(
    "q_schema_evolution",
    oracle=f"""
        SELECT coalesce(CASE WHEN o_orderstatus = 'O'
                             THEN o_orderpriority END, 'none') AS prio,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN o_orderstatus = 'O'
                               THEN o_orderpriority END) AS BIGINT)
                   AS n_with_prio,
               {oracle_dsum_fixed("o_totalprice", 2)} AS price
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY 1 ORDER BY 1
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (mergeSchema): an ingest directory whose
    early batch wrote (orderkey, totalprice) and whose later batch
    added o_orderpriority is read back as ONE table with the union
    schema — old rows surface NULL for the added column, exactly the
    contract Delta/Iceberg schema evolution gives a 100 TB ingest that
    cannot rewrite history. The aggregate proves both the union
    (row/price mass per priority with 'none' for pre-evolution rows)
    and the column back-fill semantics.

    The oracle never reads the temp files — it states the same
    semantics over the source table (the q_source_csv round-trip
    discipline), so a mergeSchema bug (dropped batch, misaligned
    column, default instead of NULL) breaks the hash.

    Plan: two partitioned parquet writes, one mergeSchema scan
    (footer-schema union is metadata work, scan stays columnar +
    pushdown), broadcast-free single agg. Price mass rides int64
    cents."""
    import os

    import shutil

    # the app-id suffix makes the write->mergeSchema-read round-trip
    # safe under concurrent sessions on one host (e.g. bench while a
    # diffcheck runs) — each session round-trips its own directory.
    # Sibling dirs from FINISHED sessions are reaped here (age-gated:
    # only dirs untouched for > 1 h, so a LIVE concurrent session is
    # never clobbered) — without the reap, a grading round's many
    # short-lived sessions would accumulate orders-sized parquet
    # under /tmp forever.
    parent = os.path.join(
        "/tmp",
        "nas_src_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
        "schema_evo",
    )
    app_id = spark.sparkContext.applicationId
    if os.path.isdir(parent):
        import time as _time

        cutoff = _time.time() - 3600
        for stale in os.listdir(parent):
            sp = os.path.join(parent, stale)
            try:
                if stale != app_id and os.path.getmtime(sp) < cutoff:
                    shutil.rmtree(sp, ignore_errors=True)
            except OSError:
                pass
    out = os.path.join(parent, app_id)
    o = load(spark, sf_dir, "orders")
    o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(out, "batch=1"), os.path.join(out, "batch=2")
    )
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("none")).alias(
                "prio"
            )
        )
        .agg(
            F.count("*").alias("n"),
            F.count("o_orderpriority").cast("long").alias("n_with_prio"),
            dsum_fixed("o_totalprice", "price", digits=2),
        )
        .orderBy("prio")
    )


# ------------------------------------------------ BPE merge apply

@REG.register(
    "q_bpe_apply",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), vocab AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt
            FROM toks WHERE tok IS NOT NULL AND tok != ''
            GROUP BY tok
        ), pairs AS (
            SELECT substring(tok, CAST(i AS INTEGER), 2) AS pair,
                   CAST(sum(cnt) AS BIGINT) AS n
            FROM vocab, UNNEST(range(1, len(tok))) AS u(i)
            WHERE len(tok) >= 2
            GROUP BY 1
        ), top1 AS (
            SELECT pair FROM pairs
            ORDER BY n DESC, pair ASC LIMIT 1
        ), applied AS (
            SELECT v.cnt,
                   len(v.tok) AS len_before,
                   (len(v.tok)
                    - len(replace(v.tok, t.pair, ''))) // 2 AS occ
            FROM vocab v CROSS JOIN top1 t
        )
        SELECT (SELECT pair FROM top1) AS merged_pair,
               CAST(sum(cnt * occ) AS BIGINT) AS n_merges,
               CAST(sum(CASE WHEN occ > 0 THEN cnt ELSE 0 END)
                    AS BIGINT) AS n_tokens_affected,
               CAST(sum(cnt * len_before) AS BIGINT) AS chars_before,
               CAST(sum(cnt * (len_before - occ)) AS BIGINT)
                   AS chars_after,
               CAST(floor(sum(cnt * occ) * 1000000.0
                          / sum(cnt * len_before)) AS BIGINT)
                   AS reduction_ppm
        FROM applied
    """,
)
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration END-TO-END: pick the highest-count
    adjacent character pair (the q_bpe_pair_counts statistic) and
    APPLY the merge across the corpus — reporting merges performed,
    tokens touched, and the exact symbol-stream compression the merge
    buys (the quantity the trainer's greedy objective maximizes;
    Sennrich et al.).

    Merge semantics: non-overlapping left-to-right replacement —
    string replace() in BOTH engines scans left-to-right, exactly the
    BPE greedy application order, and each merge shortens the symbol
    stream by one, so occurrences = (len - len(after-removal)) / 2
    without materializing merged strings.

    Scale plan: both the pair scan AND the apply run over the DISTINCT
    vocabulary with frequency weights (the q_bpe_pair_counts trick) —
    at 100 TB the merge step never touches the raw token stream; the
    winning pair is a 1-row TakeOrdered broadcast.

    Determinism: integer counts/lengths; top-1 ties break on the pair
    string (ASCII corpus alphabet). Headroom (r11 tick-sum audit):
    the cnt * occ / cnt * len sums are bounded by total corpus
    CHARACTERS — int64 holds to 9.2e18 chars (~9.2 EB of text), 5
    orders past the design point."""
    from ngram_analytics_spark.operators import spread

    toks = (
        spread(load(spark, sf_dir, "documents"))
        .select(F.explode_outer(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    pairs = (
        vocab.filter(F.length("tok") >= 2)
        .select(
            "cnt",
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, length(tok) - 1),"
                    " i -> substring(tok, i, 2))"
                )
            ).alias("pair"),
        )
        .filter(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )
    top1 = (
        pairs.orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(1)
        .select("pair")
    )
    applied = vocab.crossJoin(F.broadcast(top1)).select(
        "cnt",
        F.length("tok").alias("len_before"),
        F.expr(
            "(length(tok) - length(replace(tok, pair, ''))) div 2"
        ).alias("occ"),
        "pair",
    )
    return applied.agg(
        F.min("pair").alias("merged_pair"),
        F.sum(F.col("cnt") * F.col("occ")).cast("long").alias("n_merges"),
        F.sum(F.when(F.col("occ") > 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_tokens_affected"),
        F.sum(F.col("cnt") * F.col("len_before"))
        .cast("long")
        .alias("chars_before"),
        F.sum(F.col("cnt") * (F.col("len_before") - F.col("occ")))
        .cast("long")
        .alias("chars_after"),
        F.floor(
            F.sum(F.col("cnt") * F.col("occ"))
            * F.lit(1_000_000.0)
            / F.sum(F.col("cnt") * F.col("len_before"))
        )
        .cast("long")
        .alias("reduction_ppm"),
    )


# ------------------------------------------- BPE training loop

#: unrolled merge rounds for the end-to-end trainer
_BPE_LOOP_ROUNDS = 3

#: DuckDB-side round template pieces (chained CTEs; see oracle below)
_BPE_V0 = r"""
        v0 AS (
            SELECT ',,' || regexp_replace(tok, '(.)', '\1,,', 'g') AS enc,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            WHERE tok IS NOT NULL AND tok != ''
            GROUP BY 1
        )
"""


def _bpe_round_sql(r: int) -> str:
    prev = f"v{r - 1}"
    return f"""
        , p{r} AS (
            SELECT s.syms[u.i] || ',' || s.syms[u.i + 1] AS pair,
                   CAST(sum(cnt) AS BIGINT) AS n
            FROM (
                SELECT list_filter(string_split(enc, ','),
                                   x -> x != '') AS syms, cnt
                FROM {prev}
            ) s, UNNEST(range(1, len(s.syms))) AS u(i)
            GROUP BY 1
        ), t{r} AS (
            SELECT pair, n FROM p{r}
            ORDER BY n DESC, pair ASC LIMIT 1
        ), v{r} AS (
            SELECT replace(enc,
                       ',' || replace(t.pair, ',', ',,') || ',',
                       ',' || replace(t.pair, ',', '') || ',') AS enc,
                   cnt
            FROM {prev} CROSS JOIN t{r} t
        ), s{r} AS (
            -- GROUP BY the round literal: an EMPTY corpus yields 0
            -- rows per round exactly like the Spark loop
            -- (empty-probe r11; non-empty output unchanged)
            SELECT CAST({r} AS BIGINT) AS rnd,
                   (SELECT replace(pair, ',', '|') FROM t{r})
                       AS merged_pair,
                   (SELECT n FROM t{r}) AS pair_n,
                   CAST(sum(cnt * len(list_filter(
                       string_split(enc, ','), x -> x != '')))
                       AS BIGINT) AS stream_syms
            FROM v{r}
            GROUP BY 1
        )
    """


_BPE_SYMS_EXPR = "filter(split(enc, ','), x -> x != '')"


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared Sennrich trainer under q_bpe_train_loop and
    q_bpe_encode: returns (vocabs, tops) where vocabs[r] is the
    weighted vocabulary (tok, enc, cnt) AFTER r merge rounds
    (vocabs[0] = the char-split start) and tops[r-1] the 1-row
    (pair, n) argmax frame merged in round r. Every frame is
    eager-localCheckpointed (the gd_loop unroll discipline: each
    round's vocab is referenced twice downstream)."""
    from ngram_analytics_spark.operators import spread

    toks = (
        spread(load(spark, sf_dir, "documents"))
        .select(F.explode_outer(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .select(
            "tok",
            F.expr(
                "concat(',,', regexp_replace(tok, '(.)', '$1,,'))"
            ).alias("enc"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )
    vocabs, tops = [vocab], []
    for _ in range(_BPE_LOOP_ROUNDS):
        pairs = (
            vocab.select("cnt", F.expr(_BPE_SYMS_EXPR).alias("syms"))
            # length >= 2 BEFORE the sequence lambda: Spark's
            # sequence(1, 0) yields DESCENDING [1, 0], not empty
            .filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode_outer(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> concat(element_at(syms, i), ',',"
                        " element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
            )
            .filter(F.col("pair").isNotNull())
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        # 1-row eager checkpoint: top has TWO consumers (the merge
        # projection and the round's stats frame) and each would
        # otherwise re-run the vocab-wide pair aggregation
        top = (
            pairs.orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top))
            .select(
                "tok",
                F.expr(
                    "replace(enc,"
                    " concat(',', replace(pair, ',', ',,'), ','),"
                    " concat(',', replace(pair, ',', ''), ','))"
                ).alias("enc"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
        vocabs.append(vocab)
        tops.append(top)
    return vocabs, tops


@REG.register(
    "q_bpe_train_loop",
    oracle="WITH " + _BPE_V0
    + "".join(_bpe_round_sql(r) for r in range(1, _BPE_LOOP_ROUNDS + 1))
    + " SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT * FROM s{r}" for r in range(1, _BPE_LOOP_ROUNDS + 1)
    )
    + ") ORDER BY rnd",
)
def q_bpe_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END BPE tokenizer training, {r} merge rounds unrolled
    (VERDICT r8 "Next round" item 6): each round counts adjacent
    SYMBOL pairs over the weighted vocabulary, broadcasts the argmax
    pair, and applies the merge — so round 2 merges against round 1's
    merged symbols, the real Sennrich et al. training loop rather than
    q_bpe_apply's single iteration. Per round: the merged pair, its
    corpus-weighted count, and the symbol-stream length after the
    merge (the greedy objective's progress).

    Symbol-sequence representation: words are DOUBLE-comma-separated
    symbol strings (",,h,,e,,l,,l,,o,,"), so a merge of pair (a,b) is
    ONE string replace of ",a,,b," -> ",ab,". The doubled separator
    is what makes a single replace pass EXACT greedy left-to-right
    non-overlapping merging: each match consumes only the inner comma
    of each flanking ",," (the replacement restores it), so adjacent
    occurrences share no characters — with single commas (",a,b," in
    ",a,b,a,b,") consecutive matches share the boundary comma and
    replace() silently skips every second link; two passes fix
    alternating chains but same-symbol runs like ",a,a,a,a,a," still
    land a different matching (and for runs >= 9 a different merge
    COUNT) than greedy. replace() scans left-to-right identically in
    both engines; tests/test_properties.py pins the Spark result to a
    symbol-level pure-Python greedy trainer on run/chain-heavy words.
    The corpus alphabet is comma-free (FIXTURES.md ASCII tokens),
    asserted nowhere because the encoding would hash-fail loudly if
    it ever weren't.

    Scale plan (the q_bpe_pair_counts discipline, looped): every
    round runs over the DISTINCT vocabulary with frequency weights —
    the token stream is touched ONCE to build vocab; each round is a
    vocab-sized pair explode (map-side combined, <= |alphabet|^2-ish
    key domain), a 1-row TakeOrdered broadcast, and a per-row
    replace. Per-round eager localCheckpoint keeps the twice-
    referenced vocab's plan linear (the q_ml_gd_loop / q_graph_kcore
    unroll discipline).

    Determinism: integer counts; argmax ties break on the pair string
    (ASCII); merged_pair renders the comma as '|' for display."""
    vocabs, tops = _bpe_train(spark, sf_dir)
    syms_expr = _BPE_SYMS_EXPR
    stats_frames = []
    for rnd in range(1, _BPE_LOOP_ROUNDS + 1):
        vocab, top = vocabs[rnd], tops[rnd - 1]
        stats_frames.append(
            vocab.agg(
                F.sum(
                    F.col("cnt")
                    * F.size(F.expr(syms_expr))
                )
                .cast("long")
                .alias("stream_syms")
            )
            .crossJoin(F.broadcast(top))
            .select(
                F.lit(rnd).cast("long").alias("rnd"),
                F.expr("replace(pair, ',', '|')").alias("merged_pair"),
                F.col("n").cast("long").alias("pair_n"),
                "stream_syms",
            )
        )
    out = stats_frames[0]
    for fr in stats_frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("rnd")


q_bpe_train_loop.__doc__ = q_bpe_train_loop.__doc__.format(
    r=_BPE_LOOP_ROUNDS
)


# ------------------------------------------------ BPE encode pass

def _bpe_tok_round_sql(r: int) -> str:
    """DuckDB round template for the tok-carrying encode chain (the
    q_bpe_train_loop chain with the original token kept through the
    merges so the trained vocabulary can be joined back to the
    corpus)."""
    prev = f"e{r - 1}"
    return f"""
        , ep{r} AS (
            SELECT s.syms[u.i] || ',' || s.syms[u.i + 1] AS pair,
                   CAST(sum(cnt) AS BIGINT) AS n
            FROM (
                SELECT list_filter(string_split(enc, ','),
                                   x -> x != '') AS syms, cnt
                FROM {prev}
            ) s, UNNEST(range(1, len(s.syms))) AS u(i)
            GROUP BY 1
        ), et{r} AS (
            SELECT pair, n FROM ep{r}
            ORDER BY n DESC, pair ASC LIMIT 1
        ), e{r} AS (
            SELECT tok,
                   replace(enc,
                       ',' || replace(t.pair, ',', ',,') || ',',
                       ',' || replace(t.pair, ',', '') || ',') AS enc,
                   cnt
            FROM {prev} CROSS JOIN et{r} t
        )
    """


_BPE_E0 = r"""
        e0 AS (
            SELECT tok,
                   ',,' || regexp_replace(tok, '(.)', '\1,,', 'g')
                       AS enc,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            WHERE tok IS NOT NULL AND tok != ''
            GROUP BY 1
        )
"""


@REG.register(
    "q_bpe_encode",
    oracle="WITH " + _BPE_E0
    + "".join(_bpe_tok_round_sql(r) for r in range(1, _BPE_LOOP_ROUNDS + 1))
    + f"""
        , lt AS (
            SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
            FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            WHERE tok IS NOT NULL AND tok != ''
            GROUP BY lang, tok
        ), vs AS (
            SELECT tok,
                   CAST(len(list_filter(string_split(enc, ','),
                                        x -> x != '')) AS BIGINT)
                       AS n_syms
            FROM e{_BPE_LOOP_ROUNDS}
        )
        SELECT l.lang,
               CAST(sum(l.cnt) AS BIGINT) AS ws_tokens,
               CAST(sum(l.cnt * v.n_syms) AS BIGINT) AS bpe_symbols,
               CAST(sum(l.cnt * len(l.tok)) AS BIGINT) AS n_chars,
               CAST(sum(l.cnt * v.n_syms) * 1000000 // sum(l.cnt)
                    AS BIGINT) AS syms_per_tok_ppm,
               CAST(sum(l.cnt * len(l.tok)) * 1000000
                    // sum(l.cnt * v.n_syms) AS BIGINT)
                   AS chars_per_sym_ppm
        FROM lt l JOIN vs v USING (tok)
        GROUP BY l.lang
        ORDER BY l.lang
    """,
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE pass (VERDICT r9 stretch item 7 — closes the
    tokenizer story train -> encode): apply the {r} merges learned by
    q_bpe_train_loop's exact-greedy trainer to the corpus and report
    per language the whitespace-token count, the encoded BPE-symbol
    count, and the compression ratios (symbols per token, chars per
    symbol) — the number a tokenizer team actually tracks when
    deciding how many merges to train.

    Plan: the trainer (shared helper _bpe_train — identical frames,
    same per-round eager checkpoints) runs over the DISTINCT weighted
    vocabulary; encoding the corpus is then ONE vocab-keyed join of
    the per-(lang, token) counts onto the final vocabulary's
    symbol-count column — the token stream itself is never re-merged
    (encode cost is vocab-sized, the q_bpe_pair_counts discipline).

    Determinism: integer counts and floor-div ppm ratios; the merge
    sequence is the property-pinned exact-greedy one. Headroom (r11
    tick-sum audit): cnt * n_syms / cnt * len sums are bounded by
    total corpus characters — int64-safe to ~9.2 EB of text."""
    from ngram_analytics_spark.operators import spread

    vocabs, _tops = _bpe_train(spark, sf_dir)
    vs = vocabs[-1].select(
        "tok",
        F.size(F.expr(_BPE_SYMS_EXPR)).cast("long").alias("n_syms"),
    )
    lt = (
        spread(load(spark, sf_dir, "documents"))
        .select(
            "lang", F.explode_outer(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    j = lt.join(vs, "tok").select(
        "lang",
        "cnt",
        "n_syms",
        F.length("tok").cast("long").alias("tok_chars"),
    )
    return (
        j.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("ws_tokens"),
            F.sum(F.col("cnt") * F.col("n_syms"))
            .cast("long")
            .alias("bpe_symbols"),
            F.sum(F.col("cnt") * F.col("tok_chars"))
            .cast("long")
            .alias("n_chars"),
            F.expr(
                "sum(cnt * n_syms) * 1000000 div sum(cnt)"
            )
            .cast("long")
            .alias("syms_per_tok_ppm"),
            F.expr(
                "sum(cnt * tok_chars) * 1000000 div sum(cnt * n_syms)"
            )
            .cast("long")
            .alias("chars_per_sym_ppm"),
        )
        .orderBy("lang")
    )


q_bpe_encode.__doc__ = q_bpe_encode.__doc__.format(r=_BPE_LOOP_ROUNDS)
