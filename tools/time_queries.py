"""Time selected registry queries at one or more sf dirs.

Methodology matches BASELINE.md's scale addenda: one noop-sink warmup
pass (page cache + JIT), then N interleaved passes per query, report
the min. Output is a markdown table row per query when two dirs are
given (sf0.1 + sf1 ratio format).

Usage: python tools/time_queries.py [--passes N] sf_dir [sf_dir2] q_x q_y ...
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    args = sys.argv[1:]
    passes = 3
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    dirs = [a for a in args if not a.startswith("q_")]
    names = [a for a in args if a.startswith("q_")]

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from ngram_analytics_spark.session import get_spark

    spark = get_spark()
    qs = e.queries()
    results: dict[str, list[float]] = {}

    for d in dirs:
        # warmup pass
        for n in names:
            qs[n](spark, d).write.format("noop").mode("overwrite").save()
        best = {n: float("inf") for n in names}
        for _ in range(passes):
            for n in names:
                t0 = time.time()
                qs[n](spark, d).write.format("noop").mode("overwrite").save()
                best[n] = min(best[n], time.time() - t0)
        for n in names:
            results.setdefault(n, []).append(best[n])

    for n in names:
        ts = results[n]
        if len(ts) == 2:
            ratio = ts[1] / ts[0] if ts[0] else float("nan")
            print(f"| {n} | {ts[0]:.3f} | {ts[1]:.3f} | {ratio:.1f} |")
        else:
            print(f"| {n} | " + " | ".join(f"{t:.3f}" for t in ts) + " |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
