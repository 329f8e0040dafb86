"""Table catalog: parquet loaders for the driver-generated test tables.

Replaces the reference's CDAP source/sink framework glue
(MockSource/MockSink, NGramTransformTest.java:118-125) with plain
DataSource V2 parquet scans — columnar, predicate-pushdown and
column-pruning capable out of the box.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame (lazy parquet scan).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long and convert to a
    microsecond timestamp (integer division — no float precision loss;
    matches DuckDB's ns->us truncation when formatting).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # date_format/year/date_trunc results depend on the session TZ; the
    # harness may hand us a session without it pinned — every query goes
    # through here, so pin it defensively (runtime-settable conf).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # driver layout: TIMESTAMP(NANOS) surfaced as long
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # driver layout: TIMESTAMP(MICROS) without timezone; the
            # engine's time functions (unix_micros, window, ...) expect
            # the session-TZ type — with the session pinned to UTC the
            # cast preserves every instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register all tables as temp views for spark.sql() queries."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
