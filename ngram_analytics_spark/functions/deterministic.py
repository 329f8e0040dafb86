"""Deterministic float handling for cross-engine differential testing.

Two hazards make naive ``ROUND(agg, 4)`` flip between Spark and DuckDB:

1. **Summation order**: float addition is not associative; Spark's
   partial-agg order differs from DuckDB's. Fix: accumulate in exact
   DECIMAL (associative), round IN DECIMAL SPACE (exact half-up on both
   engines), cast the ≤4-decimal-digit result to double (exact).

2. **Round-tie semantics on doubles**: for a quotient like
   ``307.03/8 = 38.37875`` Spark rounds the *shortest decimal
   representation* (BigDecimal half-up → .3788) while DuckDB rounds the
   *binary* value (38.374999… → .3787). Fix: never use the engines'
   ``round`` on computed doubles; use :func:`round4det` /
   :func:`oracle_round4det` — the same floor-based formula spelled
   identically on both engines, so every intermediate double is
   bit-identical by IEEE determinism.

At 100 TB the decimal accumulation costs one widened column in the
partial aggregates — still map-side combined and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 17 integer digits + 8 fractional: enough for sums of trillions with
# sub-cent precision; fits Spark/DuckDB DECIMAL(38,*) growth on SUM.
DEC = "decimal(25,8)"


def round_det(c: Column, digits: int = 4, alias: str | None = None) -> Column:
    """Half-away-from-zero round(x, digits) built from floor/abs/sign
    only — bit-identical across engines (see module docstring)."""
    scale = float(10 ** digits)
    out = F.floor(F.abs(c) * scale + F.lit(0.5)) * F.signum(c) / F.lit(scale)
    return out.alias(alias) if alias else out


def round4det(c: Column, alias: str | None = None) -> Column:
    return round_det(c, 4, alias)


def oracle_round_det(expr: str, digits: int = 4) -> str:
    """DuckDB SQL matching :func:`round_det` operation-for-operation."""
    scale = float(10 ** digits)
    return (
        f"(CAST(floor(abs({expr}) * {scale} + 0.5) AS DOUBLE)"
        f" * (CASE WHEN ({expr}) < 0 THEN -1.0 WHEN ({expr}) > 0 THEN 1.0 ELSE 0.0 END)"
        f" / {scale})"
    )


def oracle_round4det(expr: str) -> str:
    return oracle_round_det(expr, 4)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM(double) rounded to 4 decimals in exact
    decimal space."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)), 4).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG(double): exact decimal sum, deterministic
    double division, tie-safe rounding."""
    c = F.col(col) if isinstance(col, str) else col
    out = round4det(F.sum(c.cast(DEC)).cast("double") / F.count(c))
    return out.alias(alias) if alias else out


def round4(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = round4det(c.cast("double"))
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL matching :func:`dsum` exactly."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,8))), 4) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB SQL matching :func:`davg` exactly."""
    q = f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,8))) AS DOUBLE) / COUNT({expr})"
    return oracle_round4det(q)
