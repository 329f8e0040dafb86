"""Per-stage wall/metric profile for registry queries (guide-style
empirical loop: which stage is slow, and is it compute, shuffle or
scheduling?).

Runs each named query warm (noop sink), then once measured with the
Spark UI enabled, and reads /api/v1 stage metrics for the jobs the
query submitted (attributed via setJobDescription). Reports, per
stage: task count, executorRunTime, shuffle read/write bytes, input
bytes — the gap between sum(stage wall) and query wall is scheduling/
driver/py4j overhead.

Usage: python tools/stageprof.py sf_dir q_x [q_y ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from ngram_analytics_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    qs = e.queries()

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
            return json.load(r)

    app_id = rest("applications")[0]["id"]

    # page-cache + JIT warmup
    qs["q_scan_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        df = qs[name](spark, sf_dir)  # warm construction
        df.write.format("noop").mode("overwrite").save()  # warm run
        sc.setJobDescription(f"prof:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)

        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs")
            if j.get("description") == f"prof:{name}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = {
            s["stageId"]: s
            for s in rest(f"applications/{app_id}/stages?status=COMPLETE")
        }
        tot_run = 0.0
        print(f"\n== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages")
        for sid in stage_ids:
            s = stages.get(sid)
            if not s:
                print(f"  stage {sid}: (skipped/reused)")
                continue
            run = s["executorRunTime"] / 1000.0
            tot_run += run
            print(
                f"  stage {sid}: {s['numCompleteTasks']:3d} tasks  "
                f"run {run:6.3f}s  "
                f"in {s['inputBytes']>>10:6d}K  "
                f"sr {s['shuffleReadBytes']>>10:6d}K  "
                f"sw {s['shuffleWriteBytes']>>10:6d}K  "
                f"| {s['name'].split(chr(10))[0][:60]}"
            )
        print(f"  sum(executorRunTime) {tot_run:.3f}s  "
              f"(wall - sum = sched/driver overhead if 1-at-a-time)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
