"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ngram_analytics_spark``; this module only
adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from ngram_analytics_spark.queries import build_registry

    return build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the 'analytics' in ngram-analytics: corpus-wide top-k
    bigrams over documents (scan -> tokenize -> ngram transform ->
    explode -> aggregate -> top-k), i.e. the reference operator
    (NGramTransform.java:95-134) composed into a full pipeline with
    no driver-side materialization.
    """
    from ngram_analytics_spark.queries.text_q import q_ngram_topk

    return q_ngram_topk(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry().queries)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (rows-only checks
    for keys intentionally absent here)."""
    return dict(_registry().oracles)
