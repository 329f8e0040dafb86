"""The 5 reference tests, ported verbatim (NGramTransformTest.java).

Golden data from NGramTransformTest.java:74-76, expected n-grams from
:233-245. Assertions are order-insensitive (the reference uses
HashSet-of-lists equality, :157-162).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ngram_analytics_spark.operators.ngram import ngram, ngram_col

TOKENS_A = ["hi", "i", "am", "cdap"]
TOKENS_B = ["how", "are", "you", "cdap"]
TOKENS_SHORT = ["hi", "i"]

GOLDEN_2N = {("hi i", "i am", "am cdap"), ("how are", "are you", "you cdap")}
GOLDEN_3N = {("hi i am", "i am cdap"), ("how are you", "are you cdap")}


def _multi_field_df(spark):
    # schema sourceRecord(name: string, tokens: array<string>) — :88-93
    return spark.createDataFrame(
        [Row(name="a", tokens=TOKENS_A), Row(name="b", tokens=TOKENS_B)]
    )


@pytest.mark.parametrize("use_mllib", [False, True])
def test_multi_fields_source_with_2n(spark, use_mllib):
    """testMultiFieldsSourceWith2N (:131-166): column-drop semantics +
    golden bigrams + single-field output schema."""
    out = ngram(
        _multi_field_df(spark), "tokens", 2, "ngrams", use_mllib=use_mllib
    )
    assert out.columns == ["ngrams"]  # exactly 1 field (:163-165)
    rows = {tuple(r.ngrams) for r in out.collect()}
    assert rows == GOLDEN_2N
    assert dict(out.dtypes)["ngrams"] == "array<string>"


@pytest.mark.parametrize("use_mllib", [False, True])
def test_single_field_source_with_3n(spark, use_mllib):
    """testSingleFieldSourceWith3N (:168-198): trigram goldens."""
    df = spark.createDataFrame([Row(tokens=TOKENS_A), Row(tokens=TOKENS_B)])
    out = ngram(df, "tokens", 3, "ngrams", use_mllib=use_mllib)
    rows = {tuple(r.ngrams) for r in out.collect()}
    assert rows == GOLDEN_3N


def test_fewer_sequence_than_n_strings_default_empty(spark):
    """Rebuild default: < n tokens => EMPTY array (MLlib semantics;
    SURVEY.md §7 Phase 1 decision), not a pipeline failure."""
    df = spark.createDataFrame([Row(tokens=TOKENS_SHORT)])
    out = ngram(df, "tokens", 3, "ngrams")
    assert [list(r.ngrams) for r in out.collect()] == [[]]


def test_fewer_sequence_than_n_strings_reference_mode(spark):
    """testFewerSequenceThanNStrings (:200-219): reference semantics —
    the run FAILS on short rows (error_on_short_rows=True)."""
    df = spark.createDataFrame([Row(tokens=TOKENS_SHORT)])
    out = ngram(df, "tokens", 3, "ngrams", error_on_short_rows=True)
    with pytest.raises(Exception, match="fewer than n=3 tokens"):
        out.collect()


def test_incorrect_type_for_field_to_be_transformed(spark):
    """testInCorrectTypeForFieldToBeTransformed (:221-226): STRING input
    field rejected at configure time."""
    df = spark.createDataFrame([Row(tokens="hi i am cdap")])
    with pytest.raises(ValueError, match="must be array<string>"):
        ngram(df, "tokens", 2)


def test_null_ngram_size(spark):
    """testNullNGramSize (:228-231): null/invalid n rejected eagerly."""
    df = spark.createDataFrame([Row(tokens=TOKENS_A)])
    with pytest.raises(TypeError):
        ngram(df, "tokens", None)  # type: ignore[arg-type]


def test_missing_field(spark):
    df = spark.createDataFrame([Row(tokens=TOKENS_A)])
    with pytest.raises(ValueError, match="not present"):
        ngram(df, "nope", 2)


def test_sql_and_mllib_paths_agree(spark):
    """The pure-SQL path and the reference's MLlib kernel are asserted
    equivalent on all fixture rows, n=1..5."""
    df = spark.createDataFrame(
        [Row(tokens=t) for t in (TOKENS_A, TOKENS_B, TOKENS_SHORT, [])]
    )
    for n in range(1, 6):
        sql_rows = [
            list(r.ngrams)
            for r in ngram(df, "tokens", n, drop_other_columns=False)
            .orderBy(F.size("tokens"))
            .collect()
        ]
        ml_rows = [
            list(r.ngrams)
            for r in ngram(df, "tokens", n, drop_other_columns=False, use_mllib=True)
            .orderBy(F.size("tokens"))
            .collect()
        ]
        assert sql_rows == ml_rows, f"paths disagree at n={n}"


def test_ngram_count_invariant(spark):
    """Property: len(ngrams) == max(0, len(tokens) - n + 1)."""
    import random

    rng = random.Random(42)
    data = [
        Row(tokens=[f"t{rng.randrange(20)}" for _ in range(rng.randrange(0, 12))])
        for _ in range(50)
    ]
    df = spark.createDataFrame(data, schema="tokens array<string>")
    for n in (1, 2, 3, 7):
        got = (
            ngram(df, "tokens", n, drop_other_columns=False)
            .select(
                (F.size("ngrams")
                 == F.greatest(F.size("tokens") - (n - 1), F.lit(0))).alias("ok")
            )
            .collect()
        )
        assert all(r.ok for r in got)
