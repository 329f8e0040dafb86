"""Differential-test primitives: Spark vs DuckDB-oracle comparison.

Strictly mirrors (and slightly exceeds) the driver's t2 gate: column
names (order-insensitive), row count, and an order-insensitive multiset
of stringified rows must all match.
"""

from __future__ import annotations

from collections import Counter
from datetime import date, datetime
from decimal import Decimal


def norm_value(v):
    """Engine-neutral stringification of one cell."""
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_to_multiset(columns, rows) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def spark_result(df):
    return df.columns, [tuple(r) for r in df.collect()]


def duck_result(con, sql):
    """Fetch the oracle via Arrow so engine-level output TYPES survive.

    The driver's canonicalizer fetches through pandas/Arrow, where a
    DuckDB HUGEINT column (naked integer ``sum()``) renders as ``6.0``
    / ``Decimal('6')`` while Spark's bigint renders ``6`` — the single
    root cause of all 10 round-4 hash-fails.  ``fetchall()`` coerced
    both sides to Python ``int`` and masked the divergence locally;
    Arrow keeps the HUGEINT as Decimal so the strict comparator goes
    RED here before the driver ever sees it (VERDICT r4 items 1/3).
    """
    tbl = con.execute(sql).arrow()
    cols = list(tbl.column_names)
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def compare(scols, srows, dcols, drows) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(
            f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}"
        )
        return problems
    if len(srows) != len(drows):
        problems.append(f"rowcount differs: spark={len(srows)} duck={len(drows)}")
    sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        problems.append(
            f"value multiset differs ({sum((sm - dm).values())} spark-only, "
            f"{sum((dm - sm).values())} duck-only rows)\n"
            f"    cols(sorted)={sorted(scols)}\n"
            f"    spark-only sample: {only_s}\n    duck-only sample: {only_d}"
        )
    return problems
