"""Oracle output-TYPE lint: no oracle may emit a column the driver's
canonicalizer renders differently from the Spark twin.

Round-4 post-mortem (VERDICT r4 "What's wrong" §1): DuckDB types a
naked integer ``sum()`` as HUGEINT, which pandas/Arrow render as
``6.0`` / ``Decimal('6')`` while Spark's bigint renders ``6`` — all 10
official round-4 hash-fails were exactly this, invisible to the old
``fetchall()``-based local comparator.  This lint binds every
registered oracle (metadata only — no query execution) and fails if
any output column is HUGEINT / UHUGEINT / DECIMAL, so the class cannot
recur.  If a future oracle legitimately needs DECIMAL output (Spark
twin is DecimalType), add it to ``DECIMAL_OK`` with a comment.
"""

from __future__ import annotations

import duckdb
import pytest

from ngram_analytics_spark.catalog import TABLES
from ngram_analytics_spark.queries import build_registry

SF_DIR = "/root/testdata/sf0.001"

#: oracles whose Spark twin really emits DecimalType (none today).
DECIMAL_OK: frozenset[str] = frozenset()

_BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def bound_types():
    """Bind (not execute) every oracle; return {key: [(col, type)]}."""
    reg = build_registry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for key, sql in reg.oracles.items():
        rel = con.sql(sql)
        out[key] = list(zip(rel.columns, [str(t) for t in rel.types]))
    con.close()
    return out


def test_no_hugeint_or_decimal_oracle_columns(bound_types):
    offenders = {}
    for key, cols in bound_types.items():
        bad = [
            (c, t)
            for c, t in cols
            if t in _BANNED
            or (t.startswith("DECIMAL") and key not in DECIMAL_OK)
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        "oracle output columns the driver canonicalizer renders "
        "differently from Spark bigint/double — wrap with "
        f"CAST(... AS BIGINT): {offenders}"
    )


def test_registry_binds_every_oracle(bound_types):
    """Every declared oracle must at least BIND against the catalog
    (catches typos/renames without paying execution time)."""
    reg = build_registry()
    assert set(bound_types) == set(reg.oracles)
    assert all(len(cols) > 0 for cols in bound_types.values())
