"""Merged query registry backing __spark_entry__.

Each submodule contributes a QueryRegistry; keys are the SURVEY.md §2
declared query names. Import order is alphabetical-ish; keys must be
globally unique (merge() enforces).
"""

from __future__ import annotations

from ngram_analytics_spark.registry import QueryRegistry


def build_registry() -> QueryRegistry:
    from ngram_analytics_spark.queries import (
        llm_q,
        relational,
        relational2,
        relational3,
        relational4,
        text_q,
        timeseries_q,
        udf_q,
    )

    merged = QueryRegistry()
    for mod in (
        text_q,
        relational,
        relational2,
        relational3,
        relational4,
        llm_q,
        timeseries_q,
        udf_q,
    ):
        merged.merge(mod.REG)
    return merged
