"""Hot-key skew robustness probe (the longdoc probe's analogue for
the user-keyed events family).

The shipped events corpus is uniform over user_id, which hides
hot-key shapes: per-user windows serialize one giant partition onto
one task (bounded: sort is O(n log n) on that task), but any
per-user JOIN or per-pair enumeration pays O(hot^2) — the classic
100 TB skew bomb (one celebrity user / one bot account).

Two synthetic corpora with the SAME total row count:

  uniform: 2000 users x 100 events
  skewed : ONE user with 100000 events (50%) + 1000 users x 100

and every user-keyed query timed on both. A per-user-linear (or
n log n) operator reads skewed/uniform ~1-3x (single-task sort tax);
a per-user-quadratic shape pays ~hot^2/row ~ 1000x more work on the
hot user and reads >> 5.

Deterministic data (positional arithmetic, no RNG); event types cycle
through the real corpus' domain so funnels/sessions have structure.

Usage: python tools/skew_probe.py [query ...]
Writes nothing to the repo; prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

#: queries whose plan keys on user_id (windows, groupBys, joins)
PROBE_QUERIES = [
    "q_funnel",
    "q_retention",
    "q_ewma",
    "q_user_transitions",
    "q_session_paths",
    "q_attribution",
    "q_attribution_decay",
    "q_cohort_ltv",
    "q_ts_islands",
    "q_stream_session",
    "q_stream_session_dynamic",
    "q_funnel_windowed",
    "q_rfm_segment",
    "q_basket_lift",
    "q_gdpr_cascade",
    "q_sample_reservoir",
    # --- late-r10 user-keyed additions ---
    "q_ab_srm",
    "q_ab_cuped",
]

TOTAL = 200_000
TYPES = ["view", "click", "cart", "purchase", "search", "signup"]


def make_corpus(path: str, hot: bool) -> None:
    import duckdb

    rows = []
    eid = 0

    def emit(uid: int, n: int) -> None:
        nonlocal eid
        for i in range(n):
            ts = 1_600_000_000 + (eid * 37) % 7_776_000  # ~90 days
            rows.append(
                (
                    eid,
                    ts,
                    uid,
                    TYPES[(uid + i) % len(TYPES)],
                    float((eid * 13) % 1000) / 10.0,
                    "{}",
                )
            )
            eid += 1

    if hot:
        emit(0, TOTAL // 2)
        for u in range(1, 1001):
            emit(u, 100)
    else:
        for u in range(2000):
            emit(u, 100)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, to_timestamp(?), ?, ?, ?, ?)",
        rows,
    )
    os.makedirs(path, exist_ok=True)
    con.execute(
        "COPY events TO '"
        + os.path.join(path, "events.parquet")
        + "' (FORMAT parquet)"
    )
    # user-keyed composites also read these dims; copy the smallest
    # real ones so loads succeed (they are not the timed hot path).
    # Source dir is overridable (ADVICE r9): NAS_DIM_SRC env var.
    dim_src = os.environ.get("NAS_DIM_SRC", "/root/testdata/sf0.001")
    if not os.path.isdir(dim_src):
        print(
            f"WARNING: dim-table source {dim_src!r} missing — "
            "composite user-keyed queries will ERROR instead of "
            "being probed (set NAS_DIM_SRC)",
            file=sys.stderr,
        )
    for t in ("customer", "orders", "lineitem", "nation", "region",
              "supplier", "part", "documents", "embeddings"):
        src = os.path.join(dim_src, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(path, f"{t}.parquet"))


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    names = sys.argv[1:] or PROBE_QUERIES

    base = os.path.join(tempfile.gettempdir(), "nas-skew-probe")
    shutil.rmtree(base, ignore_errors=True)
    uni, hot = os.path.join(base, "uniform"), os.path.join(base, "hot")
    make_corpus(uni, hot=False)
    make_corpus(hot, hot=True)

    from ngram_analytics_spark.queries import build_registry
    from ngram_analytics_spark.session import get_spark

    spark = get_spark(app_name="nas-skew-probe")
    qs = build_registry().queries

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    print("| query | uniform s | hot s | hot/uniform |")
    print("|---|---|---|---|")
    flagged = []
    for name in names:
        if name not in qs:
            continue
        try:
            tu = timed(name, uni)
            th = timed(name, hot)
        except Exception as ex:
            print(f"| {name} | ERROR | {type(ex).__name__} | - |")
            continue
        ratio = th / tu if tu > 0 else float("inf")
        mark = " **SKEW-QUADRATIC?**" if ratio > 5 else ""
        if ratio > 5:
            flagged.append(name)
        print(f"| {name} | {tu:.2f} | {th:.2f} | {ratio:.1f}{mark} |")
    print()
    print("flagged (>5x at equal rows):", flagged if flagged else "none")
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
