"""Count-min sketch: mergeable sub-linear frequency estimation.

Complements the HLL cardinality sketches (q_agg_hll_merge) with the
FREQUENCY side of the sketch family: a (depth x width) counter grid
where every item increments one counter per row (hash d of the item),
and a point query reads the MIN across its depth counters —
overestimation bounded by eps = e/width times the stream length with
probability 1 - (1/e)^depth (Cormode & Muthukrishnan, "An Improved
Data Stream Summary: The Count-Min Sketch and its Applications",
J. Algorithms 2005).

Spark-first representation: the sketch IS a DataFrame of non-zero
cells (d, bucket, cnt) — built with one explode + one
map-side-combined groupBy, merged by unioning cell tables and summing
(exact counter addition = the linearity property), and point-queried
with a broadcast join of the probe items against the cells. Nothing
materializes on the driver; a 4x4096 grid summarizes any stream
length in at most 16k cells, so the merge/shuffle cost is constant
regardless of input scale — the whole point of sketching at 100 TB.

No counterpart exists in the reference (its sole operator is the
n-gram transform, NGramTransform.java:95-134); north-star surface
(SURVEY.md §2.B sketch family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 4096


def _bucket(col, d: int, seed: int):
    # xxhash64 keyed per depth row; pmod keeps the bucket non-negative.
    return F.pmod(F.xxhash64(col, F.lit(seed + d)), F.lit(WIDTH))


def countmin_build(
    df: DataFrame,
    col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    seed: int = 7,
) -> DataFrame:
    """Build the cell table (d, bucket, cnt) for one item column.

    One explode (x depth, a constant) into one groupBy — partial
    aggregation collapses each task's contribution to at most
    depth*width cells before the shuffle, so shuffle volume is bounded
    by the grid size, not the row count."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(col), d, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return rows.groupBy("c.d", "c.bucket").agg(F.count("*").alias("cnt"))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, seed):
    elementwise counter addition (linearity) — a union + one groupBy
    over at most depth*width cells per input."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = DEPTH,
    seed: int = 7,
) -> DataFrame:
    """Point-query estimates for every row of ``items``: min over the
    item's depth cells. The probe side explodes to depth rows and
    joins the cell table; missing cells mean a zero counter."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(col), d, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(col, "p.d", "p.bucket")
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
