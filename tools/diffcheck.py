"""Differential harness CLI: run declared queries on Spark AND their
DuckDB oracles over the same parquet; report mismatches.

Usage:
    python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time


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
