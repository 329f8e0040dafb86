"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (JVM-side, codegen'd) — no Python
UDF in the hot path. Arrays are cast to ``array<double>`` first so both
Spark and the DuckDB oracle fold the same doubles in the same order,
making results bit-identical (see functions.deterministic rationale).

At 100 TB scale the brute-force cosine path is only used after an LSH /
bucketing prefilter (operators.similarity); these expressions are the
re-rank kernel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double fold)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def oracle_dot(a: str, b: str) -> str:
    """DuckDB SQL matching :func:`dot`: same order, same double ops."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def oracle_l2_norm(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def oracle_cosine(a: str, b: str) -> str:
    return f"({oracle_dot(a, b)} / ({oracle_l2_norm(a)} * {oracle_l2_norm(b)}))"
