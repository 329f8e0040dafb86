"""Operator library: reusable, scale-designed dataflow operators."""

from ngram_analytics_spark.operators.ngram import ngram, ngram_col, ngrams_sql

__all__ = ["ngram", "ngram_col", "ngrams_sql"]
