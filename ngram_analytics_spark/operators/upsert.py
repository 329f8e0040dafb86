"""MERGE INTO (upsert) emulation over immutable columnar storage.

Lakehouse formats (Delta/Iceberg) implement MERGE natively; their jars
are not in this container (sources.read_delta / read_iceberg are
gated), but the MERGE *semantics* — update matched rows, insert
unmatched source rows, keep unmatched target rows — are a pure
dataflow: one full outer join on the merge key plus per-column
coalesce. This operator implements that dataflow; writers persist the
result as a new snapshot (copy-on-write, the same strategy Delta uses
for merged files).

Scale design: the join shuffles both sides on the merge key once; with
a bucketed target (sources.write_bucketed) the target side's shuffle
disappears, which is the 100 TB nightly-upsert pattern (pay one
bucketed write, every later merge joins in place).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Return the post-MERGE state of ``target``.

    - matched (key in both): source values win for ``update_cols``
      (default: every non-key column of source);
    - not matched by target (source-only key): row inserted;
    - not matched by source (target-only key): row kept unchanged.

    Both inputs must share the schema on ``key`` + ``update_cols``.
    """
    if update_cols is None:
        update_cols = [c for c in source.columns if c != key]
    t = target.alias("t")
    s = source.alias("s")
    merged_key: Column = F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}"))
    cols = [merged_key.alias(key)]
    for c in target.columns:
        if c == key:
            continue
        if c in update_cols:
            cols.append(
                F.when(
                    F.col(f"s.{key}").isNotNull(), F.col(f"s.{c}")
                ).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    return t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full").select(
        *cols
    )
