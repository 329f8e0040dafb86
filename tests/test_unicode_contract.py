"""Non-ASCII (Unicode) contract pins for the text family (round 11).

The shipped corpus is pure ASCII, so the differential gate never
exercises multi-byte text — yet the cross-engine surface is a known
divergence mine: UTF-16 code units vs code points in length(),
locale-dependent case folding, regex character-class semantics, md5
over byte vs string encodings, surrogate-pair splitting. A round-11
sweep ran 23 text-family queries differentially over a corpus with
Latin diacritics, CJK, Arabic (RTL), and astral-plane emoji
(surrogate pairs in UTF-16 land): ZERO mismatches — the repo's
standing disciplines hold beyond ASCII because tokenization is
whitespace-only, lengths are code-point counts on both engines,
digests ride UTF-8 bytes, and every regex is an explicit ASCII class
(never \\w/\\p{{L}}, whose engines disagree).

This test pins that property with representative keys per discipline
so a future query that reaches for locale-dependent semantics fails
CI here instead of diverging silently at ingest time.
"""

from __future__ import annotations

import pytest

from ngram_analytics_spark.queries import build_registry

TEXTS = (
    (1, "café naïve résumé café über straße", "de", "web"),
    (2, "日本語 テスト 日本語 中文 漢字", "ja", "web"),
    (3, "emoji \U0001F600 test \U0001F680 emoji \U0001F600 end", "en", "social"),
    (4, "mixed café 日本 \U0001F600 ascii words here too", "en", "social"),
    (5, "العربية نص اختبار", "ar", "news"),
)

#: one representative per cross-engine surface: n-gram join/explode,
#: md5 digests, code-point lengths + char classes, log-tick sums over
#: unicode token domains, run-length lattice, regex classes.
KEYS = (
    "q_ngram_bigram",
    "q_ngram_topk",
    "q_ngram_chars",
    "q_dedup_exact",
    "q_text_fingerprint_exact",
    "q_text_mixed_script",
    "q_text_entropy",
    "q_text_burstiness",
    "q_text_bigram_entropy",
    "q_text_pii",
)


@pytest.fixture(scope="module")
def uni_sf(tmp_path_factory, smoke_sf):
    import shutil

    import pandas as pd

    dst = str(tmp_path_factory.mktemp("uni_sf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        shutil.copyfile(f"{smoke_sf}/{t}.parquet", f"{dst}/{t}.parquet")
    rows = [(i, t, l, s, len(t)) for i, t, l, s in TEXTS]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        f"{dst}/documents.parquet"
    )
    return dst


@pytest.fixture(scope="module")
def duck_uni(uni_sf):
    import duckdb

    from ngram_analytics_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{uni_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", KEYS)
def test_unicode_contract_differential(spark, uni_sf, duck_uni, name):
    from ngram_analytics_spark.testing import (
        compare,
        duck_result,
        spark_result,
    )

    reg = build_registry()
    scols, srows = spark_result(reg.queries[name](spark, uni_sf))
    # q_text_burstiness's df >= 5 floor legitimately empties on the
    # 5-doc corpus (both engines agree); every other key must produce
    # rows for the pin to mean anything
    if name != "q_text_burstiness":
        assert srows, f"{name} returned nothing on the unicode corpus"
    dcols, drows = duck_result(duck_uni, reg.oracles[name])
    problems = compare(scols, srows, dcols, drows)
    assert not problems, (name, problems)


def test_code_point_lengths_agree_on_astral_plane(spark, duck_uni, uni_sf):
    """The load-bearing primitive behind the zero-divergence result:
    both engines count CODE POINTS, so a surrogate-pair emoji is ONE
    character on both sides (Java's UTF-16 String.length() would say
    two)."""
    from ngram_analytics_spark.catalog import load
    import pyspark.sql.functions as F

    s = (
        load(spark, uni_sf, "documents")
        .filter(F.col("doc_id") == 3)
        .select(F.length("text").alias("n"))
        .collect()[0]
        .n
    )
    d = duck_uni.execute(
        "SELECT length(text) FROM documents WHERE doc_id = 3"
    ).fetchone()[0]
    assert s == d == len(TEXTS[2][1])
