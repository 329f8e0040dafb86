"""Placeholder — filled in as phases land."""

from ngram_analytics_spark.registry import QueryRegistry

REG = QueryRegistry()
