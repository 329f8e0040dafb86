"""Column-expression helpers shared across operators and queries."""

from ngram_analytics_spark.functions.deterministic import davg, dsum, round4
from ngram_analytics_spark.functions.vectors import cosine_sim, dot, l2_norm

__all__ = ["dsum", "davg", "round4", "cosine_sim", "dot", "l2_norm"]
