"""Split a query's wall time into plan CONSTRUCTION (driver Python +
py4j + analysis) vs EXECUTION (warm noop write), the two components
the extended bench times together (it constructs in-timer).

A query whose construction dominates is optimized by shrinking its
expression-tree build (fewer py4j round trips, fewer unrolled
columns), not by changing its physical plan.

Usage: python tools/constructprof.py sf_dir q_x [q_y ...]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from ngram_analytics_spark.session import get_spark

    spark = get_spark()
    qs = e.queries()

    # warmup: page cache + JIT
    qs["q_scan_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    print(f"{'query':32s} {'construct':>9s} {'exec-warm':>9s} {'total':>9s}")
    for name in names:
        # one cold pass to warm codegen/JIT for this query's plan
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best_c, best_x = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_c = min(best_c, t1 - t0)
            best_x = min(best_x, t2 - t1)
        print(
            f"{name:32s} {best_c:9.3f} {best_x:9.3f} "
            f"{best_c + best_x:9.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
