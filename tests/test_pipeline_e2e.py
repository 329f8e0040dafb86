"""End-to-end training-data pipeline system test: chain the operator
families ACROSS modules (exact dedup -> near-dup clustering ->
canonical selection -> deterministic sampling -> sequence packing) and
assert the cross-stage invariants a production pipeline relies on —
including invariance to partition layout, the property that makes the
whole chain reproducible on any cluster size."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run_pipeline(spark, n_parts: int):
    """documents -> exact-dedup -> near-dup cluster canonicals ->
    weighted keep -> packed sequences; returns dict of stage frames.

    ``n_parts`` perturbs the physical layout at the start; results
    must not depend on it."""
    from ngram_analytics_spark.operators.dedup import exact_dedup
    from ngram_analytics_spark.operators.graph import connected_components
    from ngram_analytics_spark.operators.similarity import cosine_edges

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(n_parts)
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(
        max(1, n_parts // 2)
    )

    # stage 1: exact dedup (keep lowest doc_id per normalized hash)
    survivors = (
        exact_dedup(docs, "doc_id", "text")
        .select(F.col("keep_id").alias("doc_id"))
    )
    deduped = docs.join(survivors, "doc_id")

    # stage 2: near-dup clusters over embeddings; keep cluster minimum
    edges = cosine_edges(emb, min_cos=0.4).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    comp = connected_components(
        edges.unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst")
            )
        )
    )
    canonical = comp.groupBy("cluster_id").agg(F.min("node").alias("doc_id"))
    kept = deduped.join(canonical.select("doc_id"), "doc_id", "left_semi")

    # stage 3: deterministic weighted keep (arithmetic uniform)
    u = ((F.col("doc_id") * 2654435761) % 1000003).cast("double") / 1000003
    wt = F.least(F.lit(1.0), F.col("n_chars").cast("double") / 400.0)
    sampled = kept.filter(u < wt)

    # stage 4: pack into 2048-token budgets per language
    from pyspark.sql.window import Window as W

    d = sampled.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        d.withColumn("c", F.sum("n_tok").over(w))
        .withColumn("pack_id", F.expr("(c - n_tok) div 2048"))
    )
    return {
        "docs": docs,
        "deduped": deduped,
        "sampled": sampled,
        "packed": packed,
    }


def test_stage_invariants(spark):
    st = _run_pipeline(spark, 8)
    n_docs = st["docs"].count()
    n_dedup = st["deduped"].count()
    n_sampled = st["sampled"].count()
    assert 0 < n_sampled <= n_dedup <= n_docs

    # dedup really removed every repeated normalized text
    dups = (
        st["deduped"]
        .groupBy(F.sha2(F.lower(F.trim("text")), 256))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0

    # every sampled doc lands in exactly one pack, budgets respected
    packed = st["packed"]
    assert packed.count() == n_sampled
    per_doc = packed.groupBy("doc_id").count().filter("count > 1").count()
    assert per_doc == 0
    over = (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.sum("n_tok").alias("t"), F.count("*").alias("n"),
            F.max("n_tok").alias("mx"),
        )
        # a pack may overflow only via its LAST doc (contiguous fill):
        # tokens-before-last stays under budget
        .filter((F.col("t") - F.col("mx")) >= 2048)
        .count()
    )
    assert over == 0


def test_pipeline_is_partitioning_invariant(spark):
    """The full chain must produce the identical kept set and pack
    assignment under different physical layouts — no stage may depend
    on partition count or row order."""
    a = _run_pipeline(spark, 4)["packed"].select(
        "doc_id", "lang", "pack_id"
    )
    b = _run_pipeline(spark, 17)["packed"].select(
        "doc_id", "lang", "pack_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
