"""Edge-case units for the data-quality family (queries/quality_q.py).

The differential gate (test_oracle_diff) certifies full-table parity;
these pin the boundary semantics the oracle data may never hit:
short-document chunking, degenerate-text entropy, and redaction of
adjacent/multiple PII spans in one value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ngram_analytics_spark.queries.quality_q import (
    _CHUNK,
    _RE_EMAIL,
    _RE_IP,
    _RE_PHONE,
    _STRIDE,
)


def _chunk_starts(spark, n_toks: int) -> list[int]:
    df = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(0), F.lit(n_toks - 1), F.lit(_STRIDE))
        ).alias("start")
    )
    return [r.start for r in df.collect()]


def test_chunk_short_doc_is_single_chunk(spark):
    # a doc no longer than one stride yields exactly one chunk; past
    # the stride a trailing (overlapped, shorter) chunk appears
    assert _chunk_starts(spark, 1) == [0]
    assert _chunk_starts(spark, _STRIDE) == [0]
    assert _chunk_starts(spark, _CHUNK) == [0, _STRIDE]


def test_chunk_lattice_covers_every_token(spark):
    # stride < chunk => consecutive chunks overlap; the last chunk's
    # span [start, start+_CHUNK) must reach the final token
    for n in (_STRIDE, _STRIDE + 1, 100, 2 * _STRIDE + _CHUNK - 1):
        starts = _chunk_starts(spark, n)
        assert starts[0] == 0
        assert all(b - a == _STRIDE for a, b in zip(starts, starts[1:]))
        assert starts[-1] + _CHUNK >= n
        # and no fully-redundant trailing chunk: the last start is
        # within the token range
        assert starts[-1] <= n - 1


def test_entropy_degenerate_doc_is_zero(spark):
    # a doc that repeats one token has entropy exactly 0 and TTR 1/n
    df = spark.createDataFrame(
        [(1, "a a a a")], ["doc_id", "text"]
    ).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    c = df.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    n = F.sum("c")
    ent = F.log2(n.cast("double")) - F.sum(
        F.col("c").cast("double") * F.log2(F.col("c").cast("double"))
    ) / n
    row = c.groupBy("doc_id").agg(ent.alias("e")).collect()[0]
    assert abs(row.e) < 1e-12


def test_pii_redaction_handles_adjacent_spans(spark):
    s = "x a@b.co c@d.io +1-555-0000 1.2.3.4 10.0.0.255 y"
    red = (
        spark.range(1)
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lit(s), _RE_EMAIL, "<EMAIL>"),
                    _RE_PHONE,
                    "<PHONE>",
                ),
                _RE_IP,
                "<IP>",
            ).alias("r"),
            F.regexp_count(F.lit(s), F.lit(_RE_EMAIL)).alias("ne"),
            F.regexp_count(F.lit(s), F.lit(_RE_PHONE)).alias("np"),
            F.regexp_count(F.lit(s), F.lit(_RE_IP)).alias("ni"),
        )
        .collect()[0]
    )
    assert red.r == "x <EMAIL> <EMAIL> <PHONE> <IP> <IP> y"
    assert (red.ne, red.np, red.ni) == (2, 1, 2)


def test_entropy_bounds_hold_on_real_corpus(spark):
    """Shannon-entropy invariants over the real documents table:
    0 <= entropy <= log2(n_toks) (+ rounding slack) and
    0 < ttr <= 1 for every document."""
    import math

    from ngram_analytics_spark.queries import build_registry

    rows = (
        build_registry()
        .queries["q_text_entropy"](spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert -1e-4 <= r.entropy <= math.log2(r.n_toks) + 1e-4, r
        assert 0 < r.ttr <= 1, r
        assert r.n_types <= r.n_toks, r
