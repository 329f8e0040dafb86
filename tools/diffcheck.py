"""Differential harness CLI: run declared queries on Spark AND their
DuckDB oracles over the same parquet; report mismatches.

A SQL-oracled key whose Spark AND oracle results are BOTH empty is
reported VACUOUS and fails the run: two empty relations hash-match by
construction, so the gate exercised no values (q_subquery_scalar
certified that way from r03 to r12 — VERDICT r12 item 2 turned the
judge's one-off scan into this permanent lint). Keys where an empty
result is the CORRECT answer on real data would go in
VACUOUS_OK (none today).

Usage:
    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

#: oracled keys allowed to certify on an empty result (none — every
#: registered key returns rows on the driver's sf dirs by contract)
VACUOUS_OK: frozenset[str] = frozenset()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import duckdb

    import __spark_entry__ as e
    from ngram_analytics_spark.catalog import TABLES
    from ngram_analytics_spark.session import get_spark
    from ngram_analytics_spark.testing import compare, duck_result, spark_result

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            scols, srows = spark_result(fn(spark, sf_dir))
        except Exception as ex:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dcols, drows = duck_result(con, oracles[name])
        except Exception as ex:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = compare(scols, srows, dcols, drows)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"    {p}")
        elif not srows and name not in VACUOUS_OK:
            failed.append(name)
            print(
                f"FAIL  {name}: VACUOUS — both engines returned 0 rows;"
                " an empty-vs-empty match certifies nothing"
                f" [{time.time()-t0:.1f}s]"
            )
        else:
            passed += 1
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{passed} oracle-matched, {rows_only} rows-only, {len(failed)} failed"
        + (f": {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
