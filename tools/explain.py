"""Dump the formatted physical plan of any declared query.

Usage:
    python tools/explain.py q_agg_group [q_join_multiway ...] [--sf DIR]

The inspection loop behind the plan-shape tests: check PushedFilters /
ReadSchema on scans, join strategies, and exchange counts before
declaring an operator done (the plan you'd want, not the first one
that passed).
"""

from __future__ import annotations

import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf_dir = sys.argv[i + 2]

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from ngram_analytics_spark.session import get_spark

    spark = get_spark()
    qs = e.queries()
    names = args or sorted(qs)
    for name in names:
        if name not in qs:
            print(f"unknown query {name!r}")
            return 1
        print(f"{'=' * 25} {name}")
        qs[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
