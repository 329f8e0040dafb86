"""Dump the formatted physical plan of any declared query.

Usage:
    python tools/explain.py q_agg_group [q_join_multiway ...] [--sf DIR]

The inspection loop behind the plan-shape tests: check PushedFilters /
ReadSchema on scans, join strategies, and exchange counts before
declaring an operator done (the plan you'd want, not the first one
that passed).
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("queries", nargs="*", help="query names (default: all)")
    parser.add_argument("--sf", default="/root/testdata/sf0.001", dest="sf_dir")
    ns = parser.parse_args()
    args, sf_dir = ns.queries, ns.sf_dir

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
