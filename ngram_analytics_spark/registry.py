"""Query registry: the bridge between query modules and __spark_entry__.

Each query module instantiates a :class:`QueryRegistry` and decorates its
query functions with ``@REG.register(name, oracle=...)``. The oracle is
the DuckDB-ANSI-SQL equivalent used by the driver's differential harness
(row-count + schema + order-insensitive value-hash at sf0.01).

Determinism conventions (FIXTURES.md): every float aggregate is rounded
to 4 decimals via exact decimal accumulation (see functions.deterministic),
every top-k tie is broken by a unique key, computed columns are aliased
identically on both sides, timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Keys declared WITHOUT a SQL oracle — BY DESIGN, not as a gap. The
#: driver's differential harness records ``err: "no_oracle"`` (a
#: rows-only check) for exactly these keys; each instead pins its
#: correctness contract in tests (determinism, error bound, or recall
#: vs an exact kernel). ``build_registry`` asserts the registry's
#: actual no-oracle set equals this map, so an accidentally-dropped
#: oracle fails loudly instead of silently joining this list.
ROWS_ONLY_BY_DESIGN: dict[str, str] = {
    "q_agg_approx_distinct": (
        "Spark's HLL++ sketch differs from DuckDB's estimator; "
        "relative error vs exact countDistinct pinned in tests"
    ),
    "q_agg_approx_percentile": (
        "Greenwald-Khanna sketch is impl-specific; rank-error bound "
        "vs exact percentile pinned in tests"
    ),
    "q_agg_hll_merge": (
        "DataSketches HLL binary sketches are not reproducible in "
        "DuckDB; <=5% error vs exact pinned in tests"
    ),
    "q_sketch_countmin": (
        "count-min hash family is impl-specific; overcount-only "
        "guarantee and error bound vs exact counts pinned in tests"
    ),
    "q_text_tfidf": (
        "MLlib HashingTF bucket indices are impl-specific; the exact "
        "term-level twin q_text_tfidf_exact is SQL-certified"
    ),
    "q_text_fingerprint": (
        "xxhash64-seeded rolling-hash fingerprints are Spark-specific; "
        "determinism pinned in tests"
    ),
    "q_dedup_fuzzy": (
        "MinHash-LSH hash family is impl-specific; determinism and "
        "recall vs the brute-force Jaccard kernel pinned in tests"
    ),
    "q_dedup_simhash": (
        "xxhash64-based SimHash signatures are Spark-specific; banding "
        "recall pinned in tests"
    ),
    "q_dedup_fuzzy_jaccard": (
        "candidate set depends on the rare-shingle cutoff (plan "
        "includes distinct-over-join); verified against the "
        "brute-force kernel in tests"
    ),
    "q_sim_ann_ivf": (
        "approximate top-k by construction; recall vs brute_force_knn "
        "pinned in tests"
    ),
}


class QueryRegistry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def register(self, name: str, oracle: str | None = None):
        """Register a query; ``oracle=None`` => rows-only check."""

        def deco(fn: QueryFn) -> QueryFn:
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = oracle
            return fn

        return deco

    def merge(self, other: "QueryRegistry") -> None:
        overlap = self.queries.keys() & other.queries.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        self.queries.update(other.queries)
        self.oracles.update(other.oracles)
