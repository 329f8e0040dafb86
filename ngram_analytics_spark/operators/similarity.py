"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(queries x corpus); used
as the re-rank kernel and the recall oracle.
Scale paths:
- IVF (inverted file): deterministic coarse centroids; vectors are
  assigned to their nearest centroid once (one broadcast join), queries
  probe only the ``n_probe`` nearest cells — corpus-side work drops by
  ~n_cells/n_probe. All DataFrame ops, centroid set broadcast.
- Random-hyperplane LSH (MLlib BucketedRandomProjectionLSH) for
  approx joins when queries are not few.

Hot-path discipline: the float->double cast and the norm are computed
ONCE per input row (below the join, O(rows)), never per pair; the
stream side of the pair join is repartitioned so the O(n^2) scoring
spreads across all cores instead of one nested-loop task; the per-pair
dot product is the sequential fold that matches the DuckDB oracle's
list_sum bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ngram_analytics_spark.functions.deterministic import round4det
from ngram_analytics_spark.functions.vectors import (
    cosine_from_parts,
    dot,
    l2_norm,
)

# Fold kernel (dim=None) is the default: it matches the DuckDB oracle's
# list_sum fold bit-for-bit and, with norms precomputed per side and the
# stream side repartitioned across cores, outperforms the unrolled
# codegen chain (which overflows the 64KB codegen budget at dim=64 and
# falls back to slower interpreted evaluation).
DEFAULT_DIM = None


def _parallelize(df: DataFrame) -> DataFrame:
    """Ensure the stream side of a nested-loop pair join has at least
    one partition per core — tiny dimension tables otherwise serialize
    the whole O(n^2) scoring onto a single task."""
    target = df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _side(df: DataFrame, id_col: str, vec_col: str, out_id: str,
          out_vec: str, out_norm: str, dim: int | None) -> DataFrame:
    """Project one join side to (id, vec-as-double, norm) — the cast and
    the norm are computed ONCE per row, below the join (the join's
    per-pair projection then only references materialized attributes)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).cast("array<double>").alias(out_vec),
    ).select(
        out_id,
        out_vec,
        l2_norm(F.col(out_vec), dim).alias(out_norm),
    )


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    The query side is broadcast — at 100 TB the corpus never shuffles;
    each executor scores its local corpus partitions against the
    (small) query set, and only k rows per (partition, query) survive
    the window's group-limit pushdown.
    """
    q = _side(queries, id_col, vec_col, "query_id", "_qv", "_qn", dim)
    c = _parallelize(_side(corpus, id_col, vec_col, "neighbor_id", "_cv", "_cn", dim))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "_cos",
        cosine_from_parts(
            dot(F.col("_qv"), F.col("_cv"), dim), F.col("_qn"), F.col("_cn")
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", round4det(F.col("_cos")).alias("cos_sim"), "rn")
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 20,
    n_probe: int = 3,
    centroid_stride: int | None = None,
    dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """Approximate top-k via IVF: deterministic coarse quantizer.

    Centroids are a deterministic corpus subsample (``id % stride == 0``
    capped to n_cells) — reproducible without iterative k-means; swap in
    MLlib KMeans centroids for better recall when training cost is
    acceptable.
    """
    n = corpus.count()
    stride = centroid_stride or max(1, n // n_cells)
    centroids = (
        corpus.filter((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).cast("array<double>").alias("_centv"),
        )
    )

    def nearest_cells(df: DataFrame, side_id: str, vcol: str, top: int) -> DataFrame:
        scored = df.join(F.broadcast(centroids)).withColumn(
            "_csim",
            dot(F.col(vcol), F.col("_centv"), dim)
            / (l2_norm(F.col(vcol), dim) * l2_norm(F.col("_centv"), dim)),
        )
        w = W.partitionBy(side_id).orderBy(F.col("_csim").desc(), F.col("cell_id"))
        return (
            scored.withColumn("_crn", F.row_number().over(w))
            .filter(F.col("_crn") <= top)
            .drop("_centv", "_csim", "_crn")
        )

    assigned = nearest_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        ),
        "neighbor_id",
        "_cv",
        1,
    )
    probed = nearest_cells(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ),
        "query_id",
        "_qv",
        n_probe,
    )
    scored = (
        assigned.join(F.broadcast(probed), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_cos",
            cosine_from_parts(
                dot(F.col("_qv"), F.col("_cv"), dim),
                l2_norm(F.col("_qv"), dim),
                l2_norm(F.col("_cv"), dim),
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", round4det(F.col("_cos")).alias("cos_sim"), "rn")
    )


def similarity_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.35,
    dim: int | None = DEFAULT_DIM,
) -> DataFrame:
    """All pairs above a cosine threshold (exact all-pairs self-join).

    At scale, prefilter with LSH bucketing (see ivf_knn/minhash) before
    the exact kernel; the exact form is the correctness oracle.
    """
    a = _parallelize(_side(corpus, id_col, vec_col, "id_a", "_va", "_na", dim))
    b = _side(corpus, id_col, vec_col, "id_b", "_vb", "_nb", dim)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "_cos",
            cosine_from_parts(
                dot(F.col("_va"), F.col("_vb"), dim), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("_cos") >= min_cos)
        .select("id_a", "id_b", round4det(F.col("_cos")).alias("cos_sim"))
    )


def lsh_similarity_join(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_l2: float = 10.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate pair join via random-hyperplane bucketing (MLlib
    BucketedRandomProjectionLSH over the L2 metric)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold_l2, distCol="l2_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            round4det(F.col("l2_dist")).alias("l2_dist"),
        )
    )
