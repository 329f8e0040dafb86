"""Binned (bucketized) range join — the scale path for pure time-range
predicates.

A plain range-predicate join with no equi key plans as
BroadcastNestedLoopJoin: every left row is checked against every right
row — O(n*m), catastrophic at 100 TB (SURVEY.md §4.2 "range-join
performance"). The standard fix is the bin-join trick:

1. pick a bin width >= the maximum interval length;
2. each *interval* row is exploded to every bin it overlaps
   (``sequence(bin(start), bin(end))`` — a bounded fan-out: width >=
   interval length means at most 2 bins per row);
3. each *point* row maps to exactly one bin;
4. equi-join on the bin (shuffle hash / sort-merge — scalable,
   AQE-skew-handled), then re-apply the exact range predicate.

Each (point, interval) match is found in exactly one bin — the point's
own bin — so no dedup pass is needed.

The reference has no join surface at all (its one operator is a per-row
transform, NGramTransform.java:95-134); this operator belongs to the
north-star engine surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_to_bin(ts: Column, width_s: int) -> Column:
    """Floor a timestamp to its fixed-width bin id (epoch-second based —
    fixed-width bins only, so calendar units like month don't apply)."""
    return F.floor(F.unix_timestamp(ts) / width_s).cast("long")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    interval_start: Column,
    interval_end: Column,
    bin_width: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows on
    ``interval_start <= point_ts < interval_end`` via bin equi-join.

    ``bin_width`` trades shuffle fan-out for bin selectivity: each
    interval is exploded to EVERY bin it overlaps, so a too-small width
    never drops matches — it only multiplies the interval side's rows
    (fan-out stays <= 2 bins per interval once width >= the longest
    interval, which is the sweet spot).

    Only ``how='inner'`` is supported: the exact range predicate is
    re-applied AFTER the equi-join, so any outer variant would drop its
    null-extended rows there and silently degrade to inner.

    Returns the joined frame with both sides' columns; duplicate column
    names must be disambiguated by the caller beforehand.
    """
    if how != "inner":
        raise ValueError(
            "binned_range_join supports how='inner' only: the exact "
            "range predicate runs post-join and would drop outer rows"
        )
    width_s = _bin_seconds(bin_width)
    p = points.withColumn("__bin_p", _floor_to_bin(F.col(point_ts), width_s))
    i = (
        intervals.withColumn(
            "__bin_i",
            F.explode(
                F.sequence(
                    _floor_to_bin(interval_start, width_s),
                    _floor_to_bin(interval_end, width_s),
                )
            ),
        )
    )
    exact = (F.col(point_ts) >= interval_start) & (F.col(point_ts) < interval_end)
    return (
        p.join(i, on=F.col("__bin_p") == F.col("__bin_i"), how=how)
        .filter(exact)
        .drop("__bin_p", "__bin_i")
    )


def _bin_seconds(bin_width: str) -> int:
    """Parse '<n> <unit>' into seconds."""
    n_str, unit = bin_width.strip().split()
    n = int(n_str)
    seconds = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }
    if unit not in seconds:
        raise ValueError(f"unsupported bin unit {unit!r}")
    return n * seconds[unit]
