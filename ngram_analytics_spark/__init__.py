"""ngram_analytics_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``data-integrations/ngram-analytics`` (a CDAP SparkCompute n-gram plugin,
see /root/reference), re-expressed as an idiomatic PySpark engine:

- DataFrame/SQL first: every operator is a lazy Catalyst plan; no
  driver-side materialization (the reference's ``collectAsList`` +
  ``parallelize`` round-trip, NGramTransform.java:119-120, is the
  anti-pattern this engine exists to eliminate).
- Beyond reference parity (the n-gram transform, NGramTransform.java:95-134)
  the engine provides the full declared surface of SURVEY.md §2.B:
  relational core (scans/filters/joins/aggs/windows/sorts/set-ops/scalar
  functions), text analytics, LLM-data-pipeline operators (dedup,
  similarity search, multimodal columns), and time-series/streaming.

Layout:
- ``session``    SparkSession factory tuned for the harness (AQE, UTC).
- ``catalog``    parquet table loaders / temp-view registration.
- ``operators``  reusable operator implementations (ngram, dedup,
                 similarity, as-of join, sessionize, text, multimodal).
- ``functions``  column-expression helpers (deterministic aggregates,
                 cosine similarity, tokenizers).
- ``queries``    the declared query registry backing __spark_entry__.
- ``streaming``  Structured Streaming wrappers + batch-parity helpers.
- ``sources``    readers/writers beyond plain parquet.
"""

__version__ = "0.1.0"
