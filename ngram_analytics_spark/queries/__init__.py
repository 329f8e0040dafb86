"""Merged query registry backing __spark_entry__.

Each submodule contributes a QueryRegistry; keys are the SURVEY.md §2
declared query names and must be globally unique (merge() enforces).

Key ORDER matters: the differential driver grades the registry keys in
iteration order, so GRADED_FIRST pins the keys with correctness RISK
at the front and the rest follow OLDEST-DRIVER-GRADE-FIRST, keeping
certification staleness bounded without any hand-maintained queue.
"""

from __future__ import annotations

from ngram_analytics_spark.registry import QueryRegistry

# The ~50 keys the differential driver should grade first — GENERATED
# by ``python tools/graded_window.py`` (VERDICT r11 item 6; the
# doc-lint test_graded_first_matches_generator pins this tuple to the
# tool's output, so editing a query without regenerating fails the
# suite).  Composition rule: (a) keys with no driver CORRECTNESS row
# yet, (b) keys whose own function/oracle text changed since the
# round base (real contract risk), (c) the stalest-graded tail — for
# r12 that is the VERDICT r11 item-1 cohort: the r01 pair
# (q_agg_approx_distinct / q_text_tfidf) and the r03
# q_fn_*/q_subquery_*/q_set_ops/q_source_* block, eight-plus rounds
# of engine churn since their last hard driver grade.
GRADED_FIRST: tuple[str, ...] = (
    "q_dedup_incremental_fuzzy",
    "q_ab_mann_whitney",
    "q_dedup_semantic",
    "q_ml_cost_threshold",
    "q_ml_auc_pr",
    "q_ml_kendall_tau",
    "q_ts_mann_kendall",
    "q_ml_pr_at_recall",
    "q_text_readability",
    "q_ml_auc",
    "q_embed_bucket_stats",
    "q_text_diversity",
    "q_graph_clustering_coeff",
    "q_agg_approx_distinct",
    "q_text_tfidf",
    "q_agg_hll_merge",
    "q_fn_bitwise",
    "q_fn_cast",
    "q_fn_cond",
    "q_fn_date2",
    "q_fn_explode_pos",
    "q_fn_hash",
    "q_fn_higher_order",
    "q_fn_interval",
    "q_fn_map",
    "q_fn_map_json",
    "q_fn_regexp2",
    "q_fn_string2",
    "q_fn_struct",
    "q_fn_trig",
    "q_fn_try",
    "q_fn_url",
    "q_fn_variant",
    "q_funnel",
    "q_graph_pagerank",
    "q_merge_upsert",
    "q_multimodal_audio",
    "q_quant_int8",
    "q_retention",
    "q_sample_hash",
    "q_sample_stratified",
    "q_set_ops_all",
    "q_sort_nulls",
    "q_source_csv",
    "q_source_json",
    "q_source_orc",
    "q_source_pyds",
    "q_sql_pipe",
    "q_subquery_exists_corr",
    "q_subquery_in",
)
# indirect (one-hop helper) changes this round, re-graded via the
# oldest-first rotation below rather than displacing the stale
# cohort: the 17 q_stream_live_* keys (streaming stage-dir symlink
# cleanup touched read_events_stream/read_documents_stream).

#: The r7-r12 hand-maintained DEFERRED_R* promotion queues are
#: retired: everything after GRADED_FIRST now orders itself
#: oldest-driver-grade-first from the CORRECTNESS_r*.json archives at
#: the repo root (committed each round close; the newest may briefly
#: be untracked in the post-grade state — tools/graded_window.py and
#: the doc lint tolerate that), so staleness is bounded by
#: construction instead of by queue bookkeeping.


def _latest_grades() -> dict[str, int]:
    """key -> newest round with a driver CORRECTNESS row (from the
    committed per-round archives at the repo root). Mirrors
    tools/graded_window.latest_grades (kept dependency-free here:
    tools/ is not a package)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                keys = json.load(fh)
        except (OSError, ValueError):
            continue
        for k in keys:
            latest[k] = max(latest.get(k, 0), rnd)
    return latest


def build_registry() -> QueryRegistry:
    from ngram_analytics_spark.queries import (
        corpus_q,
        events_q,
        graph_q,
        layout_q,
        llm_q,
        pipeline_q,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        sampling_q,
        text_q,
        timeseries_q,
        udf_q,
    )

    merged = QueryRegistry()
    for mod in (
        text_q,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        llm_q,
        timeseries_q,
        udf_q,
        pipeline_q,
        events_q,
        corpus_q,
        graph_q,
        layout_q,
        sampling_q,
        quality_q,
    ):
        merged.merge(mod.REG)

    missing = [k for k in GRADED_FIRST if k not in merged.queries]
    if missing:
        raise ValueError(f"GRADED_FIRST keys not registered: {missing}")
    from ngram_analytics_spark.registry import ROWS_ONLY_BY_DESIGN

    no_oracle = set(merged.queries) - set(merged.oracles)
    if no_oracle != set(ROWS_ONLY_BY_DESIGN):
        raise ValueError(
            "no-oracle keys drifted from ROWS_ONLY_BY_DESIGN: "
            f"undocumented={sorted(no_oracle - set(ROWS_ONLY_BY_DESIGN))} "
            f"stale={sorted(set(ROWS_ONLY_BY_DESIGN) - no_oracle)}"
        )
    # tail: ungraded keys first (they carry the most risk), then
    # oldest driver grade first — bounded staleness by construction
    grades = _latest_grades()
    pinned = set(GRADED_FIRST)
    tail = sorted(
        (k for k in merged.queries if k not in pinned),
        key=lambda k: (grades.get(k, -1), k),
    )
    ordered = QueryRegistry()
    for key in (*GRADED_FIRST, *tail):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
