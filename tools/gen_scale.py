"""Derive a larger scale factor from an existing testdata directory.

/root/testdata ships sf0.001/0.01/0.1 only (read-only). For scale-up
benchmarking (BASELINE.md's sf1 point) this script replicates every
table K times with DISJOINT key offsets per copy, so:

- per-key cardinalities, join degrees and value distributions are
  IDENTICAL to the source (each copy is an isomorphic shard of the
  original star schema — referential integrity holds because every
  foreign key shifts by the same per-domain offset as its target);
- fixed dims (region, nation) stay fixed, exactly like TPC-H;
- timestamps are unchanged: K x rows per time window, i.e. "a bigger
  corpus over the same timespan";
- documents get a per-copy prefix token (cross-copy texts must not be
  byte-identical or exact-dedup degenerates into K-way clones);
- embeddings get a per-copy dimension ROTATION — norm-preserving and
  deterministic, so within-copy cosine structure is identical to the
  source while cross-copy pairs decorrelate.

Single parquet FILE per table (not a directory) to match the driver
layout that bench.py's page-cache warmup expects; row groups stay at
the DuckDB default (~122k rows) so Spark scan tasks parallelize.

Usage: python tools/gen_scale.py [factor] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 testdata_sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000  # > any source key; one stride per key domain copy


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TEMP TABLE copies AS SELECT * FROM range({factor}) t(c)")

    dim = con.sql(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]

    # per-table SELECT producing one replicated+remapped copy set
    selects = {
        "region": f"SELECT * FROM '{src}/region.parquet'",
        "nation": f"SELECT * FROM '{src}/nation.parquet'",
        "customer": f"""
            SELECT c_custkey + c * {OFF} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', copies
        """,
        "supplier": f"""
            SELECT s_suppkey + c * {OFF} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', copies
        """,
        "part": f"""
            SELECT p_partkey + c * {OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', copies
        """,
        "orders": f"""
            SELECT o_orderkey + c * {OFF} AS o_orderkey,
                   o_custkey + c * {OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{src}/orders.parquet', copies
        """,
        "lineitem": f"""
            SELECT l_orderkey + c * {OFF} AS l_orderkey,
                   l_partkey + c * {OFF} AS l_partkey,
                   l_suppkey + c * {OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM '{src}/lineitem.parquet', copies
        """,
        # ts re-encoded as BIGINT epoch-nanos, mirroring the driver's
        # TIMESTAMP(NANOS) layout that catalog.load reads as long
        "events": f"""
            SELECT event_id + c * {OFF} AS event_id,
                   CAST(epoch_ns(ts) AS BIGINT) AS ts,
                   user_id + c * {OFF} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', copies
        """,
        "documents": f"""
            SELECT doc_id + c * {OFF} AS doc_id,
                   'cp' || c || ' ' || text AS text,
                   lang, source,
                   CAST(length('cp' || c || ' ' || text) AS BIGINT)
                       AS n_chars
            FROM '{src}/documents.parquet', copies
        """,
        "embeddings": f"""
            SELECT vec_id + c * {OFF} AS vec_id,
                   CAST(embedding[(c % {dim}) + 1:] ||
                        embedding[1:(c % {dim})] AS FLOAT[]) AS embedding,
                   label
            FROM '{src}/embeddings.parquet', copies
        """,
    }
    for name, q in selects.items():
        out = os.path.join(dst, f"{name}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
