"""Deduplication operators for LLM training-data pipelines.

North-star surface (BASELINE.json): exact dedup, MinHash+LSH near-dup,
SimHash, n-gram Jaccard. All are pure DataFrame plans; nothing collects
to the driver.

Scale design (100 TB):
- exact: one hash-groupBy shuffle on a 32-byte key; skew-safe (hashes
  are uniform by construction).
- MinHash LSH: banding turns all-pairs O(n^2) into per-bucket joins;
  MLlib's OR-amplified hash tables do the banding.
- SimHash: per-doc 64-bit signature from one groupBy (bit votes are
  map-side combined); candidate pairs via 16-bit band equi-joins —
  4 shuffles on short keys, never an all-pairs product.
- n-gram Jaccard: candidate generation joins only on RARE n-grams
  (document frequency <= max_df) so hot n-grams never explode the
  postings join; exact Jaccard then re-checks candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ngram_analytics_spark.operators.ngram import ngram_col


def normalized_text_hash(text: Column | str) -> Column:
    """SHA-256 over lowercased+trimmed text: the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(F.lower(F.trim(c)), 256)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text hash.

    Returns (hash, keep_id, n_copies); join back on the hash to filter
    the corpus. One shuffle on the hash key.
    """
    return (
        df.groupBy(normalized_text_hash(text_col).alias("h"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def simhash_signatures(
    df: DataFrame, id_col: str, tokens_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document from token-level xxhash64 bit votes.

    explode -> per-(doc, bit) vote -> groupBy doc (map-side combined)
    -> signature assembly. Entirely JVM expressions.
    """
    tok_hash = F.xxhash64(F.col("_tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(tok_hash, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"_b{i}")
        for i in range(bits)
    ]
    sig = None
    for i in range(bits):
        term = F.when(
            F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return (
        df.select(id_col, F.explode(tokens_col).alias("_tok"))
        .groupBy(id_col)
        .agg(*votes)
        .select(id_col, sig.alias("simhash"))
    )


def simhash_candidates(
    sigs: DataFrame, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Candidate near-dup pairs: equi-join on any of four 16-bit bands
    (pigeonhole: hamming<=3 guarantees a shared band; wider radii are
    best-effort), then exact hamming filter via bit_count(XOR)."""
    bands = [
        (F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(
            f"band{i}"
        )
        for i in range(4)
    ]
    banded = sigs.select(id_col, "simhash", *bands)
    pairs = None
    for i in range(4):
        a = banded.alias("a")
        b = banded.alias("b")
        p = a.join(
            b,
            (F.col(f"a.band{i}") == F.col(f"b.band{i}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    shingle_n: int = 2,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    max_jaccard_distance: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH over n-gram shingles.

    MLlib pipeline: shingle -> binary HashingTF -> MinHashLSH(seeded)
    -> approxSimilarityJoin. Returns (id_a, id_b, jaccard_dist).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = df.select(
        F.col(id_col),
        F.array_distinct(ngram_col(tokens_col, shingle_n)).alias("_shingles"),
    ).filter(F.size("_shingles") > 0)
    tf = HashingTF(
        inputCol="_shingles", outputCol="_features", numFeatures=num_features, binary=True
    )
    # Plan barrier (tools/null_probe.py): approxSimilarityJoin's
    # self-join re-analysis re-derives both sides from the raw child
    # and can evaluate the MinHash hashFunction UDF on rows the
    # size(_shingles) > 0 filter excludes — on a corpus with NULL or
    # sub-shingle documents that is an empty vector and MLlib raises
    # "Must have at least 1 non zero entry". The eager checkpoint
    # freezes the filtered, featurized table so the join cannot
    # reorder across the filter.
    feats = tf.transform(shingled).localCheckpoint(eager=True)
    lsh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    shingle_n: int = 2,
    max_df: int = 50,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard dedup with rare-shingle candidate generation.

    1. distinct shingles per doc;
    2. postings restricted to shingles with document frequency <= max_df
       (hot shingles would quadratically explode the self-join and add
       no discriminative signal);
    3. candidate pairs = docs sharing any rare shingle;
    4. exact Jaccard on the candidates only, via full shingle sets.
    """
    sets = df.select(
        F.col(id_col),
        F.array_distinct(ngram_col(tokens_col, shingle_n)).alias("_set"),
    )
    # explode_outer + null filter, NOT explode (r15, the
    # q_dedup_minhash_exact r14 discipline): InferFiltersFromGenerate
    # would push explode's size(_set) > 0 predicate below a caller's
    # spread() exchange, evaluating the whole shingle lambda on the
    # single-task scan side. Same rows: explode drops empty/null
    # arrays, explode_outer emits one NULL row for them which the
    # filter removes.
    postings = sets.select(
        F.col(id_col), F.explode_outer("_set").alias("_sh")
    ).filter(F.col("_sh").isNotNull())
    # Rare-filter and pair generation folded into ONE pass over the
    # postings (r14): document frequency IS the per-shingle id-list
    # size (one posting per (doc, shingle) — _set is distinct), and a
    # rare shingle's pairs expand in-memory from its <= max_df ids, so
    # the old shape's separate df-count aggregate, broadcast join and
    # postings self-join (three more references that each re-ran the
    # shingle build, plus a candidate-sized shuffle) collapse into a
    # single groupBy. Pair SET identical: {(a, b) : a < b sharing the
    # shingle} is order-independent, so collect_list order cannot
    # matter, and the same .distinct() dedups across shingles.
    #
    # The max_df cut happens BEFORE the collect (r15, VERDICT r14
    # item 1): a count window over the SAME _sh key — count == the
    # old size(_ids) — drops hot (stop-word-grade) shingles while
    # their postings sit in WindowExec's SPILLABLE buffer, so a
    # shingle appearing in half a 100 TB corpus spills to disk and is
    # discarded instead of buffering its df-sized id list in ONE
    # aggregation-buffer row (executor OOM / 2 GB array hazard).
    # Window and groupBy share one _sh exchange; every surviving
    # group has <= max_df postings by construction, so the collect is
    # bounded and the old post-collect size filter is redundant.
    dfc = F.count(F.lit(1)).over(W.partitionBy("_sh"))
    cands = (
        postings.withColumn("_df", dfc)
        .filter(F.col("_df") <= max_df)
        .groupBy("_sh")
        .agg(F.collect_list(id_col).alias("_ids"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "_ids",
                        lambda a: F.transform(
                            F.filter("_ids", lambda b: b > a),
                            lambda b: F.struct(
                                a.alias("id_a"), b.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("_p")
        )
        .select(F.col("_p.id_a"), F.col("_p.id_b"))
        .distinct()
    )
    # Exact-Jaccard re-check fetches each endpoint's full shingle set
    # with ONE reference to `sets` (r15, VERDICT r14 item 6): the old
    # cands.join(sa).join(sb) shape referenced the scan+shingle
    # kernel twice more (two full corpus passes at 100 TB). Melting
    # each pair into two (role, id) rows, joining `sets` once, and
    # re-assembling via min_by/max_by on the role keeps the pair rows
    # tiny through the join and halves the heavy-side work. min_by /
    # max_by are deterministic here: exactly two rows per (id_a,
    # id_b) group with distinct roles 0/1.
    melted = cands.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("_r"), F.col("id_a").alias("_mid")
                ),
                F.struct(
                    F.lit(1).alias("_r"), F.col("id_b").alias("_mid")
                ),
            )
        ).alias("_e"),
    ).select(
        "id_a", "id_b", F.col("_e._r").alias("_r"),
        F.col("_e._mid").alias("_mid"),
    )
    fetched = melted.join(
        sets.select(F.col(id_col).alias("_mid"), "_set"), "_mid"
    )
    pairs = fetched.groupBy("id_a", "id_b").agg(
        F.min_by("_set", "_r").alias("_set_a"),
        F.max_by("_set", "_r").alias("_set_b"),
    )
    common = F.size(F.array_intersect("_set_a", "_set_b"))
    union = F.size("_set_a") + F.size("_set_b") - common
    return (
        pairs.select(
            "id_a",
            "id_b",
            common.alias("n_common"),
            F.round(common.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_index_write(
    sig: DataFrame, path: str, sig_keys: list[str]
) -> None:
    """Persist a MinHash corpus INDEX as two parquet tables — the
    state a continuously-fed pipeline keeps between crawl batches so
    near-dup checks never rescan the corpus:

    - ``{path}/groups``  — (gid, *sig_keys): one row per DISTINCT
      signature; gid = min member doc_id (clone clusters of any size
      cost ONE group row, the q_dedup_minhash_exact collapse).
    - ``{path}/members`` — (gid, doc_id, *payload): every indexed doc
      with its group and any payload columns ``sig`` carried (e.g.
      the (sds, sdx, n_sh) shingle-set fingerprint).

    Band rows are NOT materialized: they are a 4-rows-per-group
    projection of ``groups`` that the probe derives at read time, so
    the index stays signature-sized. Index size is O(distinct docs),
    32-byte-ish rows — at 100 TB corpus scale the index is ~10^-4 of
    the data and both writes shuffle on the signature key only.
    """
    grp = sig.groupBy(*sig_keys).agg(F.min("doc_id").alias("gid"))
    grp.write.mode("overwrite").parquet(f"{path}/groups")
    # members join the PERSISTED groups (one exchange on the
    # signature key; re-read keeps the lineage off the raw corpus)
    g = sig.sparkSession.read.parquet(f"{path}/groups")
    payload = [c for c in sig.columns if c not in sig_keys]
    sig.join(g, sig_keys).select("gid", *payload).write.mode(
        "overwrite"
    ).parquet(f"{path}/members")


def minhash_index_upsert(
    sig_new: DataFrame, path: str, sig_keys: list[str]
) -> None:
    """MERGE a new batch's signatures into a persisted index:
    signatures matching an existing group ADOPT its gid (members
    append only), novel signatures open a new group with gid = the
    batch's min doc_id.

    gid CONTRACT (ADVICE r12): the signature -> member-set mapping is
    ALWAYS identical to a from-scratch rebuild over the union — and
    near-dup probe results depend only on that mapping, never on gid
    labels — but the gid LABEL is first-writer-stable, not global-min:
    it equals the rebuild's gid = min(member ids) only when no later
    batch undercuts an existing group's gid (e.g. monotone-increasing
    crawl ids, the production shape). A batch doc with a SMALLER id
    than its matching group's gid keeps the group's ORIGINAL gid,
    where a rebuild would relabel — stability is deliberate (a
    relabel would rewrite history for every downstream consumer of
    the canonical id). Tests pin BOTH regimes: row-identity to
    rebuild under monotone ids, and partition-identity + stable
    labels + unchanged probe verdicts under interleaved ids
    (tests/test_properties.py).

    IDEMPOTENT under retries: already-indexed doc_ids are anti-joined
    out of the member append (one index-sized join), so an
    at-least-once scheduler re-delivering a batch cannot duplicate
    rows — re-upserting the same batch is a no-op.

    Appends are copy-free (new parquet files only); the to-append
    frames are eagerly checkpointed first so their lineage cannot
    observe the directories they are about to extend.
    """
    spark = sig_new.sparkSession
    old_g = spark.read.parquet(f"{path}/groups")
    old_ids = spark.read.parquet(f"{path}/members").select("doc_id")
    new_g = sig_new.groupBy(*sig_keys).agg(F.min("doc_id").alias("ngid"))
    resolved = (
        new_g.join(old_g, sig_keys, "left")
        .select(
            *sig_keys,
            F.coalesce("gid", "ngid").alias("gid"),
            F.col("gid").isNull().alias("_novel"),
        )
        .localCheckpoint(eager=True)
    )
    payload = [c for c in sig_new.columns if c not in sig_keys]
    members_new = (
        sig_new.join(old_ids, "doc_id", "left_anti")
        .join(resolved, sig_keys)
        .select("gid", *payload)
        .localCheckpoint(eager=True)
    )
    resolved.filter("_novel").select(*sig_keys, "gid").write.mode(
        "append"
    ).parquet(f"{path}/groups")
    members_new.write.mode("append").parquet(f"{path}/members")
