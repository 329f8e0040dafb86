from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ngram_analytics_spark.session import get_spark

    s = get_spark(app_name="ngram-analytics-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from ngram_analytics_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
