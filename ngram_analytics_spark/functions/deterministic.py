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


def _quantized(c: Column, scale: float) -> Column:
    """Row value as integer ticks of 1/scale: floor(|x|*s+0.5)*sign(x),
    all IEEE-deterministic double ops, cast to long."""
    return (F.floor(F.abs(c) * F.lit(scale) + F.lit(0.5)) * F.signum(c)).cast(
        "long"
    )


def _oracle_quantized(expr: str, scale: float) -> str:
    return (
        f"(CAST(floor(abs({expr}) * {scale} + 0.5) AS BIGINT)"
        f" * (CASE WHEN ({expr}) < 0 THEN -1 WHEN ({expr}) > 0 THEN 1 ELSE 0 END))"
    )


def dsum_fixed(col: Column | str, alias: str | None = None, digits: int = 4) -> Column:
    """Order-independent SUM(double) via fixed-point int64 accumulation.

    Each row is quantized to 10^-digits ticks (deterministic double
    ops), summed exactly in int64 (whole-stage-codegen long adds — ~5x
    the decimal(25,8) path, measured 1.61s -> 0.31s on the sf0.1 Q1
    aggregate), and descaled with one deterministic double division.

    Semantics: SUM over row-quantized values (fixed-point accounting),
    not a post-rounded exact-decimal sum like :func:`dsum` — pair it
    with :func:`oracle_dsum_fixed` spelling the same thing.
    Bounds: |total| * 10^digits must stay under 2^53 (exact double);
    at larger totals use :func:`dsum` (decimal) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10 ** digits)
    out = F.sum(_quantized(c, scale)).cast("double") / F.lit(scale)
    return out.alias(alias) if alias else out


def oracle_dsum_fixed(expr: str, digits: int = 4) -> str:
    """DuckDB SQL matching :func:`dsum_fixed` operation-for-operation."""
    scale = float(10 ** digits)
    return (
        f"(CAST(SUM({_oracle_quantized(expr, scale)}) AS DOUBLE) / {scale})"
    )


def davg_fixed(col: Column | str, alias: str | None = None, digits: int = 4) -> Column:
    """Order-independent AVG(double) on the fixed-point path: exact
    int64 tick sum, two deterministic double divisions, tie-safe round."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10 ** digits)
    out = round4det(
        F.sum(_quantized(c, scale)).cast("double") / F.lit(scale) / F.count(c)
    )
    return out.alias(alias) if alias else out


def davg_fixed_weighted(
    value: Column,
    weight: Column,
    alias: str | None = None,
    digits: int = 4,
) -> Column:
    """Weight-compressed twin of :func:`davg_fixed`: the mean of a
    value repeated ``weight`` times, computed over a (value, weight)
    compressed table.  ``sum(tick(value) * weight)`` is the identical
    int64 total the per-row spelling produces (every repeated row
    quantizes to the same tick), and the divisions are spelled in the
    same order, so it hashes equal against :func:`oracle_davg_fixed`
    bound over the uncompressed rows."""
    scale = float(10 ** digits)
    out = round4det(
        F.sum(_quantized(value, scale) * weight).cast("double")
        / F.lit(scale)
        / F.sum(weight)
    )
    return out.alias(alias) if alias else out


def oracle_davg_fixed(expr: str, digits: int = 4) -> str:
    """DuckDB SQL matching :func:`davg_fixed`."""
    scale = float(10 ** digits)
    q = (
        f"(CAST(SUM({_oracle_quantized(expr, scale)}) AS DOUBLE)"
        f" / {scale} / COUNT({expr}))"
    )
    return oracle_round4det(q)
