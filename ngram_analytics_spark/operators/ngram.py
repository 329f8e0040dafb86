"""N-gram transform — reference-parity operator (the reference's sole op).

Reference semantics (cited from /root/reference):
- ``NGramTransform.java:95-134`` — slide a window of size ``n`` over an
  ``array<string>`` token column; emit ``array<string>`` of space-joined
  n-grams (delegates to MLlib ``org.apache.spark.ml.feature.NGram``,
  import at :33, applied at :116-118).
- ``NGramTransform.java:86-92`` — configure-time validation: the input
  field must be of type ARRAY, else ``IllegalArgumentException``
  (negative test NGramTransformTest.java:221-226).
- ``NGramTransform.java:101-102`` + ``docs/NGramTransform-sparkcompute.md:45``
  — output schema is a *single* field ``output_col: array<string>``;
  every other input column is dropped.
- ``NGramTransform.java:127-129`` + test ``:200-219`` — a row with fewer
  than ``n`` tokens produces an empty n-gram array which the reference
  then fails on (non-nullable field never set => whole pipeline FAILED).
  Rebuild default is the sane MLlib semantics (empty array); pass
  ``error_on_short_rows=True`` to reproduce the reference's failure.

Architecture notes (Spark-first, NOT a port):
- The reference materializes the whole dataset on the driver between
  transform and sink (``collectAsList``+``parallelize``,
  NGramTransform.java:119-120) — an O(dataset) driver-memory ceiling.
  This implementation is one lazy Catalyst expression: no shuffle, no
  driver round-trip, embarrassingly parallel per-row => scales linearly
  with input splits at 100 TB.
- Two interchangeable physical paths, asserted equivalent in tests:
  1. pure-SQL higher-order functions (default; stays in whole-stage
     codegen, no Python, no MLlib dependency);
  2. MLlib ``pyspark.ml.feature.NGram`` (the reference's own kernel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def ngram_col(tokens: Column | str, n: int) -> Column:
    """Column expression: n-grams of an array<string> column.

    ``len(result) == max(0, size(tokens) - n + 1)`` (MLlib semantics:
    short rows yield an empty array, never NULL).

    Per-element spelling is variadic ``concat_ws(" ", element_at(c, i),
    ..., element_at(c, i+n-1))`` — identical output to the previous
    ``concat_ws(" ", slice(c, i, n))`` (concat_ws flattens/skips the
    same way) but without allocating a fresh n-element array per
    emitted gram inside the interpreted lambda; measured 2.5x on the
    sf0.1x10 bigram-count kernel (r14, guide §1 per-task work)."""
    if n < 1:
        raise ValueError(f"ngram size must be >= 1, got {n}")
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.when(
        F.size(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(c) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(c, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_explode(
    df: DataFrame,
    tokens_col: str,
    n: int,
    out_col: str = "ngram",
    keep: list[str] | None = None,
) -> DataFrame:
    """Exploded (one row per gram) n-grams of ``tokens_col`` — the
    row-stream twin of :func:`ngram_col` for consumers that explode
    anyway (counts, doc-frequency, LM scoring).

    Explodes the INDEX sequence and assembles each gram AFTER the
    explode, so the whole stage stays in codegen expressions
    (Generate of ints + element_at/concat_ws Project) instead of the
    interpreted per-element transform lambda — measured 3.0x on the
    sf0.1x10 bigram-count kernel (r14, guide §1.2/§4.1). Identical
    rows to ``explode_outer(ngram_col(...)) + isNotNull filter``:
    same index domain, same concat_ws semantics; short/NULL token
    rows explode to a NULL position and are filtered.

    ``keep`` lists the columns carried through (default: every column
    except ``tokens_col``).
    """
    if n < 1:
        raise ValueError(f"ngram size must be >= 1, got {n}")
    if keep is None:
        keep = [c for c in df.columns if c != tokens_col]
    seq = F.when(
        F.size(tokens_col) >= n,
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(*keep, tokens_col, F.explode_outer(seq).alias("__i"))
        .filter(F.col("__i").isNotNull())
        .select(
            *keep,
            F.concat_ws(
                " ",
                *[
                    F.element_at(tokens_col, F.col("__i") + j)
                    for j in range(n)
                ],
            ).alias(out_col),
        )
    )


def ngrams_sql(tokens_expr: str, n: int) -> str:
    """DuckDB-SQL equivalent of :func:`ngram_col` (oracle side).

    DuckDB list slicing is 1-based inclusive: ``l[i:i+n-1]`` is the
    n-element window starting at i; ``range(a, b)`` is empty for b<=a.
    """
    return (
        f"list_transform(range(1, len({tokens_expr}) - {n - 1} + 1), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' '))"
    )


def ngram(
    df: DataFrame,
    input_col: str,
    n: int,
    output_col: str = "ngrams",
    *,
    drop_other_columns: bool = True,
    error_on_short_rows: bool = False,
    use_mllib: bool = False,
) -> DataFrame:
    """Reference-parity n-gram transform over a token-array column.

    Args:
        df: input DataFrame.
        input_col: name of an ``array<string>`` column
            (validated like NGramTransform.java:86-92).
        n: window size (>= 1).
        output_col: name of the produced ``array<string>`` column.
        drop_other_columns: reference semantics — output schema contains
            ONLY ``output_col`` (docs/NGramTransform-sparkcompute.md:45).
            Set False for composable, column-preserving behavior.
        error_on_short_rows: reproduce the reference's runtime failure
            for rows with fewer than ``n`` tokens
            (NGramTransform.java:127-129, test :200-219). Raised
            distributedly via ``raise_error`` — no driver collect.
        use_mllib: route through ``pyspark.ml.feature.NGram`` (the
            reference's kernel, NGramTransform.java:116-118) instead of
            the pure-SQL path.
    """
    if input_col not in df.columns:
        raise ValueError(f"field {input_col!r} not present in schema")
    dtype = df.schema[input_col].dataType
    if not isinstance(dtype, ArrayType):
        # mirrors Preconditions.checkArgument(... Schema.Type.ARRAY ...)
        raise ValueError(
            f"field {input_col!r} must be array<string>, got {dtype.simpleString()}"
        )

    if use_mllib:
        from pyspark.ml.feature import NGram

        transformer = NGram(n=n, inputCol=input_col, outputCol=output_col)
        out = transformer.transform(df)
    else:
        out = df.withColumn(output_col, ngram_col(input_col, n))

    if error_on_short_rows:
        out = out.withColumn(
            output_col,
            F.when(
                F.size(F.col(input_col)) < F.lit(n),
                F.raise_error(
                    F.concat(
                        F.lit(f"row has fewer than n={n} tokens in {input_col!r}: "),
                        F.to_json(F.col(input_col)),
                    )
                ).cast("array<string>"),
            ).otherwise(F.col(output_col)),
        )

    return out.select(output_col) if drop_other_columns else out


def skipgram_col(tokens: Column | str, skip: int = 1) -> Column:
    """Column expression: k-skip bigrams of an array<string> column —
    pairs (t[i], t[i+1+skip]) joined by a space. Skip-grams widen the
    n-gram context window without the combinatorial blowup of larger n
    (Guthrie et al., "A Closer Look at Skip-gram Modelling", LREC'06);
    like :func:`ngram_col` this is a pure per-row expression: no
    shuffle, whole-stage codegen, linear in input splits."""
    if skip < 0:
        raise ValueError(f"skip must be >= 0, got {skip}")
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    gap = skip + 1
    return F.when(
        F.size(c) >= gap + 1,
        F.transform(
            F.sequence(F.lit(1), F.size(c) - gap),
            lambda i: F.concat_ws(
                " ", F.element_at(c, i), F.element_at(c, i + gap)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def skipgrams_sql(tokens_expr: str, skip: int = 1) -> str:
    """DuckDB-SQL equivalent of :func:`skipgram_col` (oracle side)."""
    gap = skip + 1
    return (
        f"list_transform(range(1, len({tokens_expr}) - {gap} + 1), "
        f"i -> ({tokens_expr})[i] || ' ' || ({tokens_expr})[i + {gap}])"
    )


def kneser_ney_bigram(bc: "DataFrame", discount: float = 0.75) -> "DataFrame":
    """Interpolated Kneser-Ney bigram probability table.

    ``bc`` must carry one row per bigram TYPE: columns ``bg`` (the
    bigram string), ``c_bi`` (its corpus count), ``w1``/``w2`` (its
    halves). Returns ``bc`` plus ``c_hist`` (forward marginal),
    ``n_types_fwd`` / ``n_types_bwd`` (distinct-continuation /
    distinct-history type counts), ``n_types`` (total bigram types)
    and ``p_kn`` — the unrounded interpolated-KN probability
    max-free form (counts >= 1 so c - D > 0 at D < 1):

        P(w2|w1) = (c(w1 w2) - D) / c(w1 .)
                 + D * N1+(w1 .) / c(w1 .) * N1+(. w2) / N1+(. .)

    Every input quantity is an exact int64; ``discount`` should be
    exact in binary (0.75 default) so the assembly arithmetic is
    bit-identical cross-engine (see q_ngram_kneser_ney's oracle).

    Scale: all tables live on the bigram-type / vocabulary domain
    (w1/w2-keyed groupBys + broadcast joins, 1-row type total); the
    caller's token pass is the only data-sized stage.

    The distribution property (for every observed history w1, the
    probabilities over the FULL vocabulary sum to 1 exactly —
    discounted mass + lambda * total continuation mass) is pinned in
    tests/test_operators.py::test_kneser_ney_sums_to_one.
    """
    from pyspark.sql import functions as F

    marg = bc.groupBy("w1").agg(
        F.sum("c_bi").alias("c_hist"), F.count("*").alias("n_types_fwd")
    )
    cont = bc.groupBy("w2").agg(F.count("*").alias("n_types_bwd"))
    tot = bc.agg(F.count("*").alias("n_types"))
    p_kn = (
        (F.col("c_bi").cast("double") - F.lit(discount)) / F.col("c_hist")
        + (F.lit(discount) * F.col("n_types_fwd") / F.col("c_hist"))
        * (F.col("n_types_bwd").cast("double") / F.col("n_types"))
    )
    return (
        bc.join(F.broadcast(marg), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("p_kn", p_kn)
    )
