"""NULL-flood robustness probe (round-10 instrument, third in the
longdoc / fact-skew series).

The shipped corpus is 100% null-free (verified: zero NULLs in any
probed column at every sf), so none of the declared queries has ever
been exercised on NULL inputs — yet a real 100 TB feed ALWAYS carries
them (dropped fields, late-arriving enrichment, upstream bugs). Two
distinct failure classes hide there:

  1. cross-engine NULL-semantics divergence: the Spark query and its
     DuckDB oracle disagree on nulled rows (group-by-NULL, null
     propagation through arithmetic vs CASE, split(NULL), string
     concat with NULL, sort order) — a correctness bug the null-free
     differential gate can never catch;
  2. null-fragility: the query raises instead of degrading.

This probe rewrites a real sf dir into a NULL-injected twin
(deterministic key-mod selectors, no RNG):

  - events.value    -> NULL where event_id % 10 < 3   (30%)
  - events.props    -> NULL where event_id % 10 in (3, 4)  (20%)
  - documents.lang  -> NULL where doc_id % 10 < 2    (20%)
  - documents.text  -> NULL where doc_id % 10 == 7   (10%)
  - lineitem.l_tax  -> NULL where l_orderkey % 10 < 3  (30%)

then runs the FULL differential harness (every declared query's Spark
plan vs its DuckDB oracle on the SAME nulled parquet) and reports
ok / MISMATCH / ERROR per query. Because both engines read identical
nulled input, any mismatch is a genuine null-semantics divergence in
the query/oracle pair, not an artifact of the injection.

Adjudication contract (BASELINE.md records the outcome): a MISMATCH
is fixed in the query or oracle; an ERROR is either fixed or
documented as outside the engine's ingest contract (the certified
q_dq_checks gate enforces non-null critical columns at ingest — a
query MAY declare its inputs gated, but the declaration must be
written down, not assumed).

Usage: python tools/null_probe.py [src_sf_dir] [query ...]
Writes the twin under $TMPDIR; prints a summary + per-query failures.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

#: (table, column, SQL predicate over the row selecting rows to NULL)
NULL_RULES = (
    ("events", "value", "event_id % 10 < 3"),
    ("events", "props", "event_id % 10 IN (3, 4)"),
    ("documents", "lang", "doc_id % 10 < 2"),
    ("documents", "text", "doc_id % 10 = 7"),
    ("lineitem", "l_tax", "l_orderkey % 10 < 3"),
)


def make_null_corpus(src: str, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rules: dict[str, list[tuple[str, str]]] = {}
    for t, c, pred in NULL_RULES:
        rules.setdefault(t, []).append((c, pred))
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        src_pq = os.path.join(src, f"{name}.parquet")
        out = os.path.join(dst, f"{name}.parquet")
        if name not in rules:
            shutil.copyfile(src_pq, out)
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src_pq}')"
            ).fetchall()
        ]
        nulled = dict(rules[name])
        select = ", ".join(
            f"CASE WHEN {nulled[c]} THEN NULL ELSE {c} END AS {c}"
            if c in nulled
            else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{src_pq}'))"
            f" TO '{out}' (FORMAT PARQUET)"
        )


def main() -> int:
    args = sys.argv[1:]
    src = args[0] if args and not args[0].startswith("q_") else (
        "/root/testdata/sf0.001"
    )
    names = [a for a in args if a.startswith("q_")]

    sys.path.insert(0, ".")
    import duckdb

    import __spark_entry__ as e
    from ngram_analytics_spark.catalog import TABLES
    from ngram_analytics_spark.session import get_spark
    from ngram_analytics_spark.testing import (
        compare,
        duck_result,
        spark_result,
    )

    dst = os.path.join(
        tempfile.gettempdir(), "nas_null_" + os.path.basename(src)
    )
    print(f"building null-injected twin of {src} at {dst}")
    make_null_corpus(src, dst)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{dst}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    ok, mismatch, error, rows_only = [], [], [], []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            scols, srows = spark_result(fn(spark, dst))
        except Exception as ex:  # noqa: BLE001
            error.append((name, "spark", str(ex).splitlines()[0][:160]))
            print(f"ERROR {name} [spark]: {str(ex).splitlines()[0][:160]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            continue
        try:
            dcols, drows = duck_result(con, oracles[name])
        except Exception as ex:  # noqa: BLE001
            error.append((name, "duckdb", str(ex).splitlines()[0][:160]))
            print(f"ERROR {name} [duckdb]: {str(ex).splitlines()[0][:160]}")
            continue
        why = compare(scols, srows, dcols, drows)
        if why:
            mismatch.append((name, why))
            print(f"MISMATCH {name}: {why[:200]}")
        else:
            ok.append(name)
    print(
        f"\n{len(ok)} ok, {len(rows_only)} rows-only (spark ran), "
        f"{len(mismatch)} MISMATCH, {len(error)} ERROR"
    )
    for name, why in mismatch:
        print(f"  MISMATCH {name}: {why[:200]}")
    for name, side, msg in error:
        print(f"  ERROR {name} [{side}]: {msg}")
    return 1 if (mismatch or error) else 0


if __name__ == "__main__":
    raise SystemExit(main())
