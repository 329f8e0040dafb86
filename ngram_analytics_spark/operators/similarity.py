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
    centroid_pick: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k via IVF: deterministic coarse quantizer.

    Centroids are a deterministic corpus subsample — the ``n_cells``
    rows with the smallest ``centroid_pick`` hash of the id (a uniform
    pseudo-random pick that needs no separate count job: one
    TakeOrdered pass, no driver action besides the plan itself).
    ``centroid_pick="xxhash64"`` is the fast JVM default;
    ``"md5"`` uses the md5-hex-prefix integer, which DuckDB can
    reproduce bit-for-bit — the SQL-certifiable pick
    (q_sim_ann_ivf_exact). Pass ``centroid_stride`` to reproduce the
    legacy ``id % stride == 0`` selection; swap in MLlib KMeans
    centroids for better recall when training cost is acceptable.
    """
    if centroid_stride is not None and centroid_stride <= 0:
        # id % 0 is NULL in Spark SQL — the filter would silently drop
        # every row and return an empty result; fail loudly instead.
        raise ValueError(
            f"centroid_stride must be positive, got {centroid_stride}"
        )
    if centroid_pick not in ("xxhash64", "md5"):
        raise ValueError(f"unknown centroid_pick: {centroid_pick!r}")
    if centroid_stride is not None:
        cent_src = corpus.filter((F.col(id_col) % centroid_stride) == 0)
        cent_order = [F.col(id_col).asc()]
    else:
        cent_src = corpus
        if centroid_pick == "md5":
            hash_col = F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
        else:
            hash_col = F.xxhash64(F.col(id_col))
        cent_order = [hash_col.asc(), F.col(id_col).asc()]
    centroids = (
        cent_src.orderBy(*cent_order)
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

    The threshold applies to the 4-dp-ROUNDED cosine (same contract as
    :func:`similarity_pairs_blas`) so the kept pair set is identical
    across the fold kernel, the BLAS kernel and the SQL oracle even
    when their summation orders differ in the last ulp.
    """
    a = _parallelize(_side(corpus, id_col, vec_col, "id_a", "_va", "_na", dim))
    b = _side(corpus, id_col, vec_col, "id_b", "_vb", "_nb", dim)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            round4det(
                cosine_from_parts(
                    dot(F.col("_va"), F.col("_vb"), dim),
                    F.col("_na"),
                    F.col("_nb"),
                )
            ),
        )
        .filter(F.col("cos_sim") >= min_cos)
        .select("id_a", "id_b", "cos_sim")
    )


def similarity_pairs_blas(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.35,
    n_blocks: int | None = None,
    a_chunk: int = 1024,
) -> DataFrame:
    """All pairs above a cosine threshold — distributed block-pair GEMM.

    Same contract as :func:`similarity_pairs` (id_a < id_b, unrounded
    threshold, 4-dp floor-rounded cos_sim), but the O(n^2 * dim) scoring
    runs as float64 matrix products inside ``applyInPandas`` tasks, one
    per PAIR OF HASH BLOCKS: each vector is hashed into one of
    ``n_blocks`` blocks, replicated to every block-pair it participates
    in (as the "A" member of pairs (b, q>=b) and the "B" member of
    pairs (p<=b, b)), and each (p, q) group scores block p against
    block q with one BLAS GEMM. Nothing is ever materialized on the
    driver and nothing is broadcast — both GEMM operands arrive via the
    shuffle, so the operator scales to corpora far past any broadcast /
    driver-memory ceiling (the round-1 version collected the whole
    corpus driver-side to build a broadcast; that failure class is the
    reference's own collectAsList anti-pattern, NGramTransform.java:119).

    Why this beats the fold kernel: the pair join materializes n^2/2
    rows just to feed 64 interpreted multiply-adds each; here the same
    arithmetic is a BLAS GEMM over contiguous memory (~100x fewer
    instruction dispatches) and only above-threshold pairs ever become
    rows.

    Scale bounds: shuffle volume is (n_blocks + 1) x corpus rows; task
    memory is two blocks (2 * n/n_blocks vectors * dim * 8 B) plus an
    ``a_chunk`` x block_rows score matrix. The default n_blocks ~
    sqrt(4 * parallelism) balances task count (n_blocks^2 / 2 GEMMs)
    against replication; raise it to shrink per-task memory at large n.
    At extreme scale, prefilter block pairs with LSH/IVF bucketing so
    only candidate pairs of blocks are scored.
    """
    spark = corpus.sparkSession
    if n_blocks is None:
        import math

        par = spark.sparkContext.defaultParallelism
        n_blocks = max(2, math.isqrt(4 * par) + 1)
    side = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_blocks))
        .cast("int")
        .alias("_blk"),
    )
    all_blocks = F.array(*[F.lit(i) for i in range(n_blocks)])
    a_role = side.select(
        "id",
        "v",
        F.col("_blk").alias("p"),
        F.explode(
            F.filter(all_blocks, lambda q: q >= F.col("_blk"))
        ).alias("q"),
        F.lit(0).alias("role"),
    )
    b_role = side.select(
        "id",
        "v",
        F.explode(
            F.filter(all_blocks, lambda p: p <= F.col("_blk"))
        ).alias("p"),
        F.col("_blk").alias("q"),
        F.lit(1).alias("role"),
    )

    def score(key, pdf):
        import numpy as np
        import pandas as pd

        p, q = key
        a = pdf[pdf["role"] == 0]
        b = pdf[pdf["role"] == 1]
        out = []
        if len(a) and len(b):
            a_ids = a["id"].to_numpy()
            a_mat = np.stack(a["v"].to_numpy()).astype(np.float64)
            a_norms = np.sqrt(np.einsum("ij,ij->i", a_mat, a_mat))
            b_ids = b["id"].to_numpy()
            b_mat = np.stack(b["v"].to_numpy()).astype(np.float64)
            b_norms = np.sqrt(np.einsum("ij,ij->i", b_mat, b_mat))
            for lo in range(0, len(a_ids), a_chunk):
                hi = lo + a_chunk
                sims = (a_mat[lo:hi] @ b_mat.T) / np.outer(
                    a_norms[lo:hi], b_norms
                )
                # Round BEFORE thresholding (identical to
                # functions.deterministic.round_det): BLAS summation
                # order can differ from the fold kernel / SQL oracle in
                # the last ulp, so thresholding the raw value could flip
                # a boundary pair between engines. At 4 dp both sides
                # agree bit-for-bit, so the kept set is engine-stable
                # (the oracle twins threshold the rounded value too).
                rounded = (
                    np.floor(np.abs(sims) * 1e4 + 0.5) * np.sign(sims) / 1e4
                )
                keep = rounded >= min_cos
                if p == q:
                    # diagonal group: A and B are the same block, every
                    # unordered pair appears in both orientations — keep
                    # the (smaller id, larger id) one.
                    keep &= a_ids[lo:hi, None] < b_ids[None, :]
                ai, bi = np.nonzero(keep)
                ida, idb = a_ids[lo:hi][ai], b_ids[bi]
                out.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(ida, idb),
                            "id_b": np.maximum(ida, idb),
                            "cos_sim": rounded[ai, bi],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return (
        a_role.unionByName(b_role)
        .groupBy("p", "q")
        .applyInPandas(score, schema="id_a long, id_b long, cos_sim double")
    )


#: Above this (estimated) corpus row count, ``cosine_edges(method=
#: "auto")`` switches from the exact block-pair GEMM to LSH-pruned
#: candidate generation.  Rationale: exact all-pairs is n^2/2 * dim
#: multiply-adds — at 2M rows x dim 64 that is ~1.3e14 flops, roughly
#: an hour of BLAS on a 32-core node and the practical edge of
#: "exact is still affordable"; past it the O(n^2) term dominates any
#: cluster you throw at it, while LSH candidate generation stays
#: near-linear in rows for clustered (real-embedding) corpora.
EXACT_EDGE_MAX_ROWS = 2_000_000


def _estimate_rows(df: DataFrame) -> int:
    """Plan-statistics row estimate — NO Spark job is launched.

    Uses Catalyst's optimized-plan statistics: exact-ish ``rowCount``
    when available (CBO/ANALYZE), else ``sizeInBytes`` (file size for
    scans) divided by the schema's default row width. File bytes are
    compressed, so the fallback can under-estimate rows by the codec
    ratio (~1-4x for float arrays) — fine for an order-of-magnitude
    dispatch threshold, and the conservative direction (under-estimating
    keeps the exact path longer, never degrades recall).
    """
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    row_count = stats.rowCount()
    if row_count.isDefined():
        return int(str(row_count.get()))
    width = max(1, int(df._jdf.schema().defaultSize()))
    return int(str(stats.sizeInBytes())) // width


def resolve_edge_method(
    corpus: DataFrame,
    method: str = "auto",
    exact_max_rows: int = EXACT_EDGE_MAX_ROWS,
) -> str:
    """Dispatch ``cosine_edges``: 'auto' -> 'block_gemm' (exact) below
    ``exact_max_rows`` estimated corpus rows, 'lsh' above. Explicit
    'block_gemm' / 'lsh' pass through unchanged."""
    if method in ("block_gemm", "lsh"):
        return method
    if method != "auto":
        raise ValueError(f"unknown method: {method!r}")
    return (
        "block_gemm" if _estimate_rows(corpus) <= exact_max_rows else "lsh"
    )


def cosine_edges(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.35,
    method: str = "auto",
    num_hash_tables: int = 10,
    bucket_length: float = 1.0,
    seed: int = 42,
    exact_max_rows: int = EXACT_EDGE_MAX_ROWS,
) -> DataFrame:
    """Near-duplicate EDGE GENERATION: all (id_a < id_b, cos_sim) pairs
    at or above ``min_cos`` — the input every dedup composite (drop-by-
    neighbor, connected components, canonical-doc selection) consumes.

    Two scale paths, same output contract as :func:`similarity_pairs`;
    ``method="auto"`` (default) picks per corpus via
    :func:`resolve_edge_method` — exact below ``exact_max_rows``
    (plan-statistics estimate, no job launched), LSH above, so the
    100 TB-safe path engages automatically instead of by manual flag:

    - ``block_gemm``: the distributed block-pair GEMM of
      :func:`similarity_pairs_blas`. EXACT — recall 1.0 by construction,
      so composites stay certifiable against an exact SQL oracle. The
      plan is hash-bucketed (block-pair shuffle + per-group BLAS), with
      no cartesian/nested-loop join node and no driver or broadcast
      materialization. The arithmetic is inherently O(n^2 * dim), but
      sharded across n_blocks^2/2 independent tasks.
    - ``lsh``: vectors are L2-NORMALIZED first, which makes cosine a
      monotone function of Euclidean distance (||a-b||^2 = 2 - 2*cos),
      then MLlib BucketedRandomProjectionLSH proposes candidate pairs
      within sqrt(2 - 2*min_cos) and an exact cosine re-check on the
      ORIGINAL vectors filters them — candidate generation is a
      bucket-hash equi-join, never all-pairs. Recall < 1.0 is possible
      (a true pair colliding in none of the hash tables is missed);
      tests pin the floor. Best when the corpus has cluster structure
      (real embeddings) so bucketing actually prunes; on isotropic
      random vectors LSH tuned for full recall degenerates to candidate
      sets near n^2, which is why the exact path is kept below the
      dispatch bound (where the oracle-certified composites live).
    """
    method = resolve_edge_method(corpus, method, exact_max_rows)
    if method == "block_gemm":
        return similarity_pairs_blas(
            corpus, id_col=id_col, vec_col=vec_col, min_cos=min_cos
        )

    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    base = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # Norm projected ONCE per row (an inner l2_norm(F.col("v")) inside
    # the lambda would re-run the O(dim) aggregate per element =
    # O(dim^2)/row); zero-norm vectors have no defined direction — drop
    # them before the LSH fit. The element expression must stay TOTAL
    # (try_divide + coalesce, not /): Catalyst may inline this
    # projection into a predicate evaluated before the norm filter, so
    # for a zero-norm row ANSI divide would trap and a NULL element
    # would break array_to_vector; the all-zero stand-in never reaches
    # the fit because the filter drops the row wherever it runs.
    unit = (
        base.withColumn("_nrm", l2_norm(F.col("v"), None))
        .filter(F.col("_nrm") > 0)
        .select(
            "id",
            "v",
            array_to_vector(
                F.transform(
                    "v",
                    lambda x: F.coalesce(
                        F.try_divide(x, F.col("_nrm")), F.lit(0.0)
                    ),
                )
            ).alias("_u"),
        )
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_u",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit)
    thresh_l2 = math.sqrt(max(0.0, 2.0 - 2.0 * min_cos)) + 1e-9
    cand = (
        model.approxSimilarityJoin(unit, unit, thresh_l2, distCol="_d")
        .filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetA.v").alias("_va"),
            F.col("datasetB.id").alias("id_b"),
            F.col("datasetB.v").alias("_vb"),
        )
    )
    cos = cosine_from_parts(
        dot(F.col("_va"), F.col("_vb"), None),
        l2_norm(F.col("_va"), None),
        l2_norm(F.col("_vb"), None),
    )
    return (
        cand.withColumn("cos_sim", round4det(cos))
        .filter(F.col("cos_sim") >= min_cos)
        .select("id_a", "id_b", "cos_sim")
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
