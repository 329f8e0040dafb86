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
