"""EMPTY-slice contract regression pins (tools/empty_probe.py, r11).

The degenerate-input probe found 12 query pairs that crashed or
diverged on a 0-row corpus — a routine condition at 100 TB (a new
source before first ingest, a filter matching nothing, a dedup stage
that removed everything). Every finding was fixed with an explicit
empty contract (nullif division guards, GROUP-BY-constant oracle
alignment, explicit read-back schemas for partitioned round-trips,
isEmpty guards ahead of MLlib fit()) or adjudicated as a documented
engine-level divergence (Spark emits no rows for grouping sets over
empty input; DuckDB/PostgreSQL emit the global set's row).

This test rebuilds the 0-row twin and re-runs one representative per
fixed family through the REAL differential compare, so a regression
in any contract fails CI instead of waiting for the next probe run.
"""

from __future__ import annotations

import pytest

from ngram_analytics_spark.queries import build_registry

#: one representative per fixed family: division guard, constant-
#: group oracle alignment, GDPR coalesce, unrolled-loop alignment,
#: partitioned write/read round-trips, MLlib fit guards.
KEYS = (
    "q_graph_reciprocity",
    "q_ab_srm",
    "q_gdpr_cascade",
    "q_bpe_train_loop",
    "q_scan_partitioned",
    "q_join_dpp",
    "q_sink_dynamic_overwrite",
    "q_ml_scaler",
)


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory, smoke_sf):
    import sys

    sys.path.insert(0, ".")
    from tools.empty_probe import make_empty_corpus

    dst = str(tmp_path_factory.mktemp("empty_sf"))
    make_empty_corpus(smoke_sf, dst)
    return dst


@pytest.fixture(scope="module")
def duck_empty(empty_sf):
    import duckdb

    from ngram_analytics_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{empty_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", KEYS)
def test_empty_contract_differential(spark, empty_sf, duck_empty, name):
    from ngram_analytics_spark.testing import (
        compare,
        duck_result,
        spark_result,
    )

    reg = build_registry()
    scols, srows = spark_result(reg.queries[name](spark, empty_sf))
    dcols, drows = duck_result(duck_empty, reg.oracles[name])
    problems = compare(scols, srows, dcols, drows)
    assert not problems, (name, problems)


def test_tfidf_empty_returns_schema_stable_frame(spark, empty_sf):
    """q_text_tfidf is rows-only (no oracle); pin that the MLlib fit
    guard returns an EMPTY frame with the declared schema instead of
    raising."""
    reg = build_registry()
    df = reg.queries["q_text_tfidf"](spark, empty_sf)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_terms", "tfidf_norm",
    ]
    assert df.count() == 0


def _rows_only_keys():
    from ngram_analytics_spark.registry import ROWS_ONLY_BY_DESIGN

    return sorted(ROWS_ONLY_BY_DESIGN)


@pytest.mark.parametrize("name", _rows_only_keys())
def test_rows_only_keys_empty_contract(spark, empty_sf, smoke_sf, name):
    """VERDICT r11 item 8: the differential probe exercises rows-only
    (no-oracle) keys on an empty corpus only as a crash check; this
    closes the remaining degenerate path by pinning their pytest-side
    contract there too — the SCHEMA is identical to the real-corpus
    schema (a consumer can union empty and non-empty slices), and the
    result is DETERMINISTIC across two executions (the sketch/hash
    family's core declared contract, which must not degrade on the
    0-row slice)."""
    reg = build_registry()
    df_empty = reg.queries[name](spark, empty_sf)
    df_real = reg.queries[name](spark, smoke_sf)
    assert [
        (f.name, f.dataType.simpleString()) for f in df_empty.schema.fields
    ] == [
        (f.name, f.dataType.simpleString()) for f in df_real.schema.fields
    ], f"{name}: empty-slice schema drifted from the real-corpus schema"
    first = sorted(map(tuple, df_empty.collect()))
    second = sorted(
        map(tuple, reg.queries[name](spark, empty_sf).collect())
    )
    assert first == second, f"{name}: nondeterministic on empty input"
