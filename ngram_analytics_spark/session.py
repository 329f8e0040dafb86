"""SparkSession factory.

The reference constructs a fresh ``SQLContext`` per transform call
(NGramTransform.java:99) — wasteful. Here one tuned session is shared.

Scale design notes (100 TB):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast decisions survive bad static estimates at cluster scale.
- ``spark.sql.shuffle.partitions`` is a local-mode default only; on a
  real cluster AQE's coalescing makes the static value far less
  critical, and per-job overrides are the tuning point.
- Session timezone pinned to UTC so date/time functions are
  deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "ngram-analytics-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local[N] runs executors inside the driver JVM: the "driver"
        # heap is really N executor threads' working memory. At 16g a
        # long session degrades 2x from GC pressure (measured: the 18-
        # query bench 31.9s@16g -> 19.8s@48g on a 128 GiB box); size it
        # like an executor, not like a cluster driver.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
