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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: str = "1 day",
) -> DataFrame:
    """Interval x interval OVERLAP join (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``) as a bin equi-join —
    the interval-interval sibling of :func:`binned_range_join`.

    Both sides explode to every bin they overlap (fan-out <= 2 once
    ``bin_width`` >= the longest interval), equi-join on the bin, then
    the exact overlap predicate re-applies. An overlapping pair shares
    EVERY bin its intersection spans, so to emit it exactly once the
    pair is CLAIMED by the bin containing ``greatest(l_start,
    r_start)`` — the later start lies inside both intervals whenever
    they overlap, so that bin is always among the shared ones and no
    dedup pass is needed. Plans as a shuffled equi-join (AQE
    skew-split applies); no nested-loop node, no data-sized broadcast.

    Duplicate column names across sides must be disambiguated by the
    caller beforehand (the :func:`binned_range_join` contract).
    """
    width_s = _bin_seconds(bin_width)
    ls, le = F.col(l_start), F.col(l_end)
    rs, re = F.col(r_start), F.col(r_end)
    l = left.withColumn(
        "__bin_l",
        F.explode(
            F.sequence(_floor_to_bin(ls, width_s), _floor_to_bin(le, width_s))
        ),
    )
    r = right.withColumn(
        "__bin_r",
        F.explode(
            F.sequence(_floor_to_bin(rs, width_s), _floor_to_bin(re, width_s))
        ),
    )
    overlap = (ls <= re) & (rs <= le)
    claim = F.col("__bin_l") == _floor_to_bin(F.greatest(ls, rs), width_s)
    return (
        l.join(r, F.col("__bin_l") == F.col("__bin_r"))
        .filter(overlap & claim)
        .drop("__bin_l", "__bin_r")
    )


#: Above this (estimated) row count on BOTH sides, ``theta_join_auto``
#: stops relying on a broadcast nested-loop plan and routes through the
#: banded equi-join. ~100k rows is a few MB broadcast — comfortably
#: inside executor memory; past it the BNL's data-sized broadcast is
#: the scale cliff (the O(n*m) predicate work is inherent to the
#: theta-join OUTPUT either way; what the banded path removes is the
#: memory ceiling and the single-broadcast bottleneck).
THETA_BNL_MAX_ROWS = 100_000


def banded_theta_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    op: str = "<",
    n_bands: int = 64,
) -> DataFrame:
    """Inequality (theta) join ``left_val OP right_val`` (OP in <, <=)
    as a banded EQUI-join — no data-sized broadcast, no nested loop.

    Both value domains share fixed-width bands from a 1-row global
    min/max stats dim (the only broadcast — one row, attached to each
    side). Each right row lands in its own band; each left row fans
    out to its band AND every higher band (``sequence(own,
    band_max)``, <= n_bands+1 ids). floor() is monotone, so a
    qualifying pair (lv OP rv) always has band(lv) <= band(rv) and is
    produced in EXACTLY one band — the right row's — then the exact
    predicate is re-applied, making the result identical to the plain
    theta join. The band key shuffles both sides (sort-merge /
    shuffled-hash, AQE skew-split applies); nothing data-sized is ever
    broadcast, which is what unblocks the join past the BNL broadcast
    ceiling. Left shuffle volume is O(rows * n_bands/2) — dwarfed by
    the theta join's own output at any size where the plan choice
    matters.

    Duplicate column names across sides must be disambiguated by the
    caller (same contract as :func:`binned_range_join`).
    """
    if op not in ("<", "<="):
        raise ValueError(f"op must be '<' or '<=': {op!r}")
    lv, rv = F.col(left_val), F.col(right_val)
    l_in = left.filter(lv.isNotNull())
    r_in = right.filter(rv.isNotNull())
    stats = (
        l_in.select(lv.cast("double").alias("_v"))
        .unionByName(r_in.select(rv.cast("double").alias("_v")))
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
        .select(
            "_lo",
            F.greatest(
                (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bands)),
                F.lit(1e-12),
            ).alias("_w"),
            "_hi",
        )
        .select(
            "_lo",
            "_w",
            F.floor((F.col("_hi") - F.col("_lo")) / F.col("_w"))
            .cast("int")
            .alias("_band_max"),
        )
    )

    def band_of(col):
        return F.floor(
            (col.cast("double") - F.col("_lo")) / F.col("_w")
        ).cast("int")

    lb = (
        l_in.crossJoin(F.broadcast(stats))
        .withColumn(
            "_band",
            F.explode(F.sequence(band_of(lv), F.col("_band_max"))),
        )
        .drop("_lo", "_w", "_band_max")
    )
    rb = (
        r_in.crossJoin(F.broadcast(stats))
        .withColumn("_band", band_of(rv))
        .drop("_lo", "_w", "_band_max")
    )
    pred = (lv < rv) if op == "<" else (lv <= rv)
    return lb.join(rb, "_band").filter(pred).drop("_band")


def theta_join_auto(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    op: str = "<",
    bnl_max_rows: int = THETA_BNL_MAX_ROWS,
    n_bands: int = 64,
) -> DataFrame:
    """One-code-path theta join: plain non-equi join (Spark plans a
    broadcast nested loop — optimal while one side fits in memory)
    when EITHER side's plan-statistics row estimate is within
    ``bnl_max_rows``, else :func:`banded_theta_join`. Mirrors
    ``cosine_edges``' size-based dispatch: no job is launched to
    decide, and the 100 TB-safe plan engages automatically instead of
    by manual rewrite."""
    from ngram_analytics_spark.operators.similarity import _estimate_rows

    if op not in ("<", "<="):
        raise ValueError(f"op must be '<' or '<=': {op!r}")
    if min(_estimate_rows(left), _estimate_rows(right)) <= bnl_max_rows:
        lv, rv = F.col(left_val), F.col(right_val)
        pred = (lv < rv) if op == "<" else (lv <= rv)
        return left.join(right, pred)
    return banded_theta_join(
        left, right, left_val, right_val, op=op, n_bands=n_bands
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
