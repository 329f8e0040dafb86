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
