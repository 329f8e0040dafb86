"""Merged query registry backing __spark_entry__.

Each submodule contributes a QueryRegistry; keys are the SURVEY.md §2
declared query names and must be globally unique (merge() enforces).

Key ORDER matters: the differential driver grades the registry keys in
iteration order, so GRADED_FIRST pins the north-star surface — the
flagship n-gram query, the LLM-data-pipeline operators (dedup /
similarity / multimodal), streaming & time-series, the vectorized UDF
family, and the scale-technique joins/aggs — at the front. The
long tail of scalar-function families follows in module order.
"""

from __future__ import annotations

from ngram_analytics_spark.registry import QueryRegistry

# The 50 keys the differential driver should grade first.  Round-6
# rotation (VERDICT r5 "Next round" item 1): exactly 37 registry keys
# have never sat inside a graded window — the 21-key DEFERRED_R6
# queue from r5 (stable TPC-H/relational shapes, judge-green in the
# full local sf0.01 differential, unchanged since r4) plus the 16
# keys added during r5 (q_dedup_containment .. q_fn_aes below).  ALL
# 37 lead this window, so every registry key holds >=1 driver-green
# CORRECTNESS row by end of r6.  The remaining slots re-certify keys
# whose code changed this round: q_winsorize and
# q_agg_weighted_median (re-planned from low-cardinality fact-table
# windows to value-domain pre-aggregation, VERDICT r5 "What's wrong"
# item 2), q_funnel_windowed (NULLIF-style zero-stage guard, ADVICE
# r5), q_ml_power_iter (DECIMAL(38,0) Gram accumulation, ADVICE r5),
# plus the keys newly added in r6.
GRADED_FIRST: tuple[str, ...] = (
    # --- never driver-graded: the 21-key r5 DEFERRED_R6 queue ---
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_join_overlap",
    "q_join_bloom",
    "q_agg_moments",
    "q_agg_bitmap",
    "q_fn_map2",
    "q_fn_json2",
    "q_fn_str_to_map",
    # --- never driver-graded: the 16 keys added during r5 ---
    "q_dedup_containment",
    "q_ml_power_iter",
    "q_join_scd2_pit",
    "q_stream_live_leaderboard",
    "q_ts_downsample",
    "q_funnel_windowed",
    "q_source_text",
    "q_source_quality",
    "q_length_buckets",
    "q_graph_jaccard_nbrs",
    "q_sample_temperature",
    "q_ts_changepoint",
    "q_fn_explode_outer",
    "q_sql_group_by_all",
    "q_agg_filter_clause",
    "q_fn_aes",
    # --- re-certification: code changed in r6 (tiny-domain fact
    # window re-plans, operators/valuedomain.py) ---
    "q_winsorize",
    "q_agg_weighted_median",
    "q_pack_sequences",
    "q_win_distribution",
    # --- new in r6 (keys appended here in the same commit that
    # lands each query + oracle + SURVEY row + BASELINE ratio) ---
    "q_dedup_minhash_exact",
    "q_dedup_simhash_exact",
    "q_ks_drift",
    "q_ts_theil_sen",
    "q_corpus_gini",
    "q_ts_autocorr",
    "q_graph_kcore",
    "q_sample_balanced",
    "q_skyline_pareto",
)

#: r5's deferred queue is fully promoted into the r6 window above;
#: kept as an (empty) marker so the rotation history reads cleanly.
DEFERRED_R6: tuple[str, ...] = ()

#: Keys added late in r6 AFTER the 50-key window filled — queued at
#: positions 51+ so they lead the round-7 graded window (each landed
#: with query + oracle + SURVEY row + BASELINE ratio in one commit;
#: judge-green in the local sf0.01 differential).
DEFERRED_R7: tuple[str, ...] = (
    "q_sketch_bloom_exact",
    "q_ts_backtest",
)


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

    missing = [
        k
        for k in (*GRADED_FIRST, *DEFERRED_R6, *DEFERRED_R7)
        if k not in merged.queries
    ]
    if missing:
        raise ValueError(
            f"GRADED_FIRST/DEFERRED keys not registered: {missing}"
        )
    overlap = set(GRADED_FIRST) & (set(DEFERRED_R6) | set(DEFERRED_R7))
    if overlap:
        raise ValueError(f"keys in both GRADED_FIRST and DEFERRED: {overlap}")
    from ngram_analytics_spark.registry import ROWS_ONLY_BY_DESIGN

    no_oracle = set(merged.queries) - set(merged.oracles)
    if no_oracle != set(ROWS_ONLY_BY_DESIGN):
        raise ValueError(
            "no-oracle keys drifted from ROWS_ONLY_BY_DESIGN: "
            f"undocumented={sorted(no_oracle - set(ROWS_ONLY_BY_DESIGN))} "
            f"stale={sorted(set(ROWS_ONLY_BY_DESIGN) - no_oracle)}"
        )
    ordered = QueryRegistry()
    pinned = set(GRADED_FIRST) | set(DEFERRED_R6) | set(DEFERRED_R7)
    for key in (
        *GRADED_FIRST,
        *DEFERRED_R6,
        *DEFERRED_R7,
        *(k for k in merged.queries if k not in pinned),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
