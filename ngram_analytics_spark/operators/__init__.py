"""Operator library: reusable, scale-designed dataflow operators."""

from pyspark.sql import DataFrame

from ngram_analytics_spark.operators.ngram import ngram, ngram_col, ngrams_sql


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to ``factor * defaultParallelism`` if the input
    has fewer partitions.

    Small or single-row-group files scan as ONE task, which serializes
    every downstream per-row kernel onto one core — a local-mode symptom
    of the same problem a 1000-executor cluster has with a handful of
    giant unsplittable inputs. One narrow round-robin shuffle of the
    (small) input buys full-width parallelism for the expensive
    compute that follows. Only worth it when the per-row work dwarfs
    the exchange cost; cheap scans should stay shuffle-free.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


__all__ = ["ngram", "ngram_col", "ngrams_sql", "spread"]
