"""NULL-contract regression pins (tools/null_probe.py, round 10).

The shipped corpus is null-free, so the per-round differential gate
can never exercise NULL inputs — the null probe built a deterministic
NULL-injected twin corpus and found 27 query/oracle pairs that
diverged or crashed on it (cross-engine NULL semantics: concat vs
concat_ws, arg_max NULL skipping, split_part(NULL), NULL group keys
falling out of equi-joins, NaN poisoning pandas kernels, MLlib
raising on empty vectors). Every finding was fixed with an EXPLICIT
null contract spelled identically on both engines (filter, coalesce,
or oracle alignment) — hash-neutral on the null-free graded corpus.

This test rebuilds the nulled twin (the probe's own injector) and
re-runs a representative key from each fixed family through the REAL
differential compare, so a regression in any contract fails CI
instead of waiting for the next probe run.
"""

from __future__ import annotations

import pytest

from ngram_analytics_spark.queries import build_registry

#: one representative per fixed family (see tools/null_probe.py):
#: recursive pandas kernel, min_by/arg_max alignment, text tokenizer,
#: JSON/map scalars, NULL group keys, outer-explode oracle, masking,
#: cogrouped pandas, multimodal blob plumbing.
KEYS = (
    "q_ewma",
    "q_ts_ohlc",
    "q_fn_array",
    "q_fn_map",
    "q_dq_homogeneity",
    "q_fn_explode_outer",
    "q_text_cloze",
    "q_udf_cogroup",
    "q_multimodal_meta",
)


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory, smoke_sf):
    import sys

    sys.path.insert(0, ".")
    from tools.null_probe import make_null_corpus

    dst = str(tmp_path_factory.mktemp("null_sf"))
    make_null_corpus(smoke_sf, dst)
    return dst


@pytest.fixture(scope="module")
def duck(null_sf):
    import duckdb

    from ngram_analytics_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{null_sf}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", KEYS)
def test_null_contract_differential(spark, null_sf, duck, name):
    from ngram_analytics_spark.testing import (
        compare,
        duck_result,
        spark_result,
    )

    reg = build_registry()
    scols, srows = spark_result(reg.queries[name](spark, null_sf))
    assert srows, f"{name} returned nothing on the nulled corpus"
    dcols, drows = duck_result(duck, reg.oracles[name])
    why = compare(scols, srows, dcols, drows)
    assert not why, f"{name} diverged on the nulled corpus: {why}"
