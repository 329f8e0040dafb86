"""Skew-aware join: salting for hot keys.

At 100 TB a handful of hot keys (a viral document, a null-ish default
user id) can put 100x the median load on a few shuffle partitions. AQE's
skew-join splitting (enabled in session.py) handles sort-merge joins at
runtime; this operator is the explicit fallback for cases AQE can't
split (e.g. aggregations onto a hot key, or broadcast-ineligible
many-to-many joins).

Mechanism: replicate the small side R times (salt 0..R-1); scatter the
big side's rows uniformly across the R salt values; join on
(key, salt). Each hot key's load spreads over R partitions. Results are
identical to the unsalted join (every big-side row still meets its key's
right-side rows exactly once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting on the join key.

    ``big`` gets a deterministic-per-row salt (hash of all columns mod
    n_salts — uniform, reproducible); ``small`` is exploded once per
    salt value. Output columns = big's ++ small's (minus join key dup).
    """
    sk = small_key or key
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = salted_big.join(
        salted_small,
        (salted_big[key] == salted_small[sk]) & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return joined.drop(salted_big["_salt"]).drop(salted_small["_salt"])


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: first aggregate on
    (key, salt) — spreads a hot key over n_salts reducers — then
    combine the partials per key. Same result as a direct groupBy."""
    return (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )
