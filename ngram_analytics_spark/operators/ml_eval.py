"""Distributed model-evaluation aggregates over corpus-scale frames.

Rank statistics (AUC) without per-row ranks: the corpus compresses to
the score-tick VALUE domain and cumulative mass runs through
operators/valuedomain.py's bucketed machinery — no unpartitioned
window, no sort-everything single node (the q_winsorize re-plan
applied to ranking; see q_ml_auc for the graded twin + SQL oracle).

Reference parity note: the reference engine has no evaluation surface
at all (its sole operator is the n-gram transform,
NGramTransform.java:95-134); this module is north-star surface
(SURVEY.md §2.B, eval family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_auc(
    df: DataFrame,
    score_ticks: Column,
    label: Column,
    bucket_width: float = 100_000.0,
) -> DataFrame:
    """EXACT tie-corrected ROC-AUC via the Mann-Whitney rank-sum
    identity, computed on the score-tick value domain.

    ``score_ticks`` must be an integer-valued column (quantize floats
    to ticks first — exactness of every rank term depends on it);
    ``label`` must evaluate to 1 (positive) / 0 (negative).

    Tie groups contribute their exact average rank through the
    HALF-RANK identity ``2*avg_rank = 2*cum_before + cnt + 1``, so
    every term is an exact integer; the rank-sum grows as n^2 (int64
    headroom runs out at n ~ 3e9 rows), so the accumulator rides
    DECIMAL(38,0)/HUGEINT from the start (r12 lint-widening audit).
    The single double division happens at the end. Returns one row:
    (n_pos, n_neg, n_scores, auc_raw) with ``auc_raw`` the unrounded
    double (callers round/alias).
    """
    from ngram_analytics_spark.operators.valuedomain import (
        grouped_value_cumsum,
    )

    pt = (
        df.select(score_ticks.alias("t"), label.alias("pos"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"), F.sum("pos").alias("npos"))
        .withColumn("g", F.lit(0))
    )
    c = grouped_value_cumsum(pt, "g", "t", ["cnt", "npos"], bucket_width)
    s = c.agg(
        F.sum(
            F.col("npos").cast("decimal(38,0)")
            * (2 * (F.col("cum_cnt") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("two_rpos"),
        F.min("tot_npos").alias("n_pos"),
        F.min("tot_cnt").alias("n_all"),
        F.count("*").alias("n_scores"),
    )
    return s.select(
        "n_pos",
        (F.col("n_all") - F.col("n_pos")).alias("n_neg"),
        "n_scores",
        (
            (
                F.col("two_rpos")
                - F.col("n_pos").cast("decimal(38,0)")
                * (F.col("n_pos") + 1)
            ).cast("double")
            / (
                2
                * F.col("n_pos").cast("decimal(38,0)")
                * (F.col("n_all") - F.col("n_pos"))
            ).cast("double")
        ).alias("auc_raw"),
    )
