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
# yet (r13: the new q_dedup_host / q_mix_doremi / q_quality_gopher),
# (b) keys whose own
# function/oracle text changed since the round base (r13: the
# de-vacuated q_subquery_scalar, the rank-seeded q_dedup_semantic,
# the pid-keyed q_dedup_incremental_fuzzy, and q_dedup_minhash_exact
# via the shared-CTE oracle refactor), (c) the stalest-graded tail —
# the remaining r03 cohort leads, retiring it per VERDICT r12 item 3.
GRADED_FIRST: tuple[str, ...] = (
    "q_dedup_host",
    "q_mix_doremi",
    "q_quality_gopher",
    "q_dedup_incremental_fuzzy",
    "q_dedup_semantic",
    "q_subquery_scalar",
    "q_dedup_minhash_exact",
    "q_subquery_lateral",
    "q_values_inline",
    "q_win_ignorenulls",
    "q_win_range_interval",
    "q_agg_bitwise",
    "q_cdc_diff",
    "q_dedup_canonical",
    "q_dedup_cluster",
    "q_dedup_embed",
    "q_fn_binary",
    "q_fn_crypto",
    "q_fn_format",
    "q_fn_levenshtein",
    "q_graph_degree",
    "q_graph_triangles",
    "q_incr_agg",
    "q_inverted_index",
    "q_join_asof_fwd",
    "q_join_asof_nearest",
    "q_join_shuffle_hash",
    "q_ml_kmeans_step",
    "q_profile_table",
    "q_sample_reservoir",
    "q_scd2",
    "q_session_paths",
    "q_sim_pairs",
    "q_sketch_countmin",
    "q_stream_foreach_upsert",
    "q_stream_live_dedup",
    "q_stream_live_join",
    "q_stream_live_pairjoin",
    "q_text_chunk",
    "q_text_pii",
    "q_text_tfidf_exact",
    "q_topk_salted",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q7",
    "q_ts_pop",
    "q_user_transitions",
    "q_zorder_layout",
)
# indirect (one-hop helper) changes this round, re-graded via the
# oldest-first rotation below rather than displacing the stale
# cohort: the minhash family keys sharing _mh_sig_frame /
# _MH_CAND_CTES (their own contract text is unchanged; pytest pins
# the shared machinery).

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
