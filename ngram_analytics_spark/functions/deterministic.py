"""Deterministic float aggregation for cross-engine differential testing.

Floating-point summation is order-dependent; Spark's partial aggregation
order differs run-to-run and engine-to-engine, so ``ROUND(SUM(double),4)``
can flip at a rounding boundary between Spark and the DuckDB oracle.
Fix: accumulate in exact DECIMAL (associative, order-independent), cast
the exact sum to double (correctly rounded, deterministic), then round.

The matching DuckDB oracle spelling is produced by :func:`oracle_dsum` /
:func:`oracle_davg` so both engines perform literally the same sequence
of exact/deterministic operations.

At 100 TB this costs one widened column in the partial aggregates —
decimal sums still map-side combine and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 17 integer digits + 8 fractional: enough for sums of trillions with
# sub-cent precision; fits Spark/DuckDB DECIMAL(38,*) growth on SUM.
DEC = "decimal(25,8)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM(double) rounded to 4 decimals."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)).cast("double"), 4)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG(double) rounded to 4 decimals."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), 4)
    return out.alias(alias) if alias else out


def round4(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(c.cast("double"), 4)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL matching :func:`dsum` exactly."""
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(25,8))) AS DOUBLE), 4)"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL matching :func:`davg` exactly."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(25,8))) AS DOUBLE)"
        f" / COUNT({expr}), 4)"
    )
