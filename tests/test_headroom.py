"""128-bit accumulator headroom pins (VERDICT r10 items 2-3).

q_ml_spearman's moment products peak at ~4n^4: with int64 partials
the sx*sx term wrapped SILENTLY past n ~ 5.5e4 rows (3x sf1 — a
wrong-answer cliff far below the 100x design point). q_ml_brier's
squared-gap sums (<= 1e12 per row) wrapped past ~9.2e6 rows. Both
were widened in r11 — Spark DECIMAL(38,0) partials, DuckDB HUGEINT
(its native sum(BIGINT) type) — pushing the bounds past 2e9 / 1e26
rows.

This test builds a 10M-row synthetic embeddings corpus (DuckDB
generation, seconds): 10M rows is ~180x past the old spearman cliff
and ~1.1x past the old brier cliff, so running BOTH queries through
the real differential compare fails CI if anyone narrows the
accumulators back to int64 (on the old code the Spark side wraps
while HUGEINT DuckDB does not -> hash mismatch, or the rho leaves
[-1, 1]).

Marked slow-ish (~30s total); the corpus is built once per module.
"""

from __future__ import annotations

import math
import os

import pytest

from ngram_analytics_spark.queries import build_registry

#: past the old q_ml_spearman n~5.5e4 cliff by 180x and the old
#: q_ml_brier n~9.2e6 cliff by ~1.1x.
N_ROWS = 10_000_000


@pytest.fixture(scope="module")
def big_sf(tmp_path_factory) -> str:
    import duckdb

    dst = str(tmp_path_factory.mktemp("headroom_sf"))
    con = duckdb.connect()
    # score = deterministic pseudo-uniform in (-1, 1) with a label
    # correlation; 10-level label like the real fixture. Arithmetic
    # (not random()) so the corpus is bit-stable across runs.
    con.execute(
        f"""
        COPY (
            SELECT i AS vec_id,
                   [CAST(((i * 2654435761 % 1000003) / 1000003.0) * 1.8
                         - 0.9 + (i % 10) * 0.01 AS FLOAT)] AS embedding,
                   CAST(i % 10 AS INTEGER) AS label
            FROM range({N_ROWS}) t(i)
        ) TO '{os.path.join(dst, "embeddings.parquet")}'
        (FORMAT parquet)
        """
    )
    con.close()
    return dst


@pytest.fixture(scope="module")
def big_duck(big_sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{big_sf}/embeddings.parquet')"
    )
    yield con
    con.close()


def _differential(spark, con, name, big_sf):
    from ngram_analytics_spark.testing import (
        compare,
        duck_result,
        spark_result,
    )

    reg = build_registry()
    scols, srows = spark_result(reg.queries[name](spark, big_sf))
    dcols, drows = duck_result(con, reg.oracles[name])
    assert not compare(scols, srows, dcols, drows), (name, srows, drows)
    return dict(zip(scols, srows[0]))


def test_spearman_past_old_int64_cliff(spark, big_sf, big_duck):
    r = _differential(spark, big_duck, "q_ml_spearman", big_sf)
    assert r["n"] == N_ROWS
    # the old wrap produced garbage ppm; the widened moments must
    # yield a valid correlation, and the fixture's +0.01*label drift
    # makes it genuinely positive
    assert -1_000_000 <= r["spearman_ppm"] <= 1_000_000
    assert r["spearman_ppm"] > 0
    assert not math.isnan(r["spearman_ppm"])


def test_brier_past_old_int64_cliff(spark, big_sf, big_duck):
    r = _differential(spark, big_duck, "q_ml_brier", big_sf)
    assert r["n"] == N_ROWS
    for k in ("brier_ppm", "brier_pos_ppm", "brier_neg_ppm"):
        assert 0 <= r[k] <= 1_000_000, (k, r[k])
