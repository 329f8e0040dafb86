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

# The 50 keys the differential driver should grade first.  Round-10
# rotation (VERDICT r9 "Next round" item 2): the DEFERRED_R10 queue
# (the r2-cohort tail the r9 window had no room for) leads, then
# q_agg_regr (the last remaining r2-certified key), then the 4 keys
# whose code changed in r10 — q_dedup_minhash_exact (the fact-skew
# probe's one flag: fingerprint-equal clone pairs short-circuit the
# exact recheck, 54.9x -> 1.0x on the clone corpus), q_bpe_train_loop
# (trainer factored into the _bpe_train helper shared with
# q_bpe_encode), and q_ngram_chars / q_embed_bucket_stats (spread()
# added: their kernels ran on the single scan task at 4% cpu —
# the r10 sf1 adjudication) — then 31 of the 35 keys NEW in r10; the
# late-r10 new-key batches displaced ALL 14 r3-cohort fills, and the
# 4 newest keys (q_ml_ks_separation / q_text_burstiness / q_ab_srm /
# q_ab_cuped) overflow to DEFERRED_R11's head; the cohort's full 44
# keys queue behind them.  Changed/new keys outrank hygiene re-certification because
# they are the only rows with correctness RISK; every deferred key is
# judge-green in each round's full local differential.
GRADED_FIRST: tuple[str, ...] = (
    # --- oldest-first re-certification: DEFERRED_R10 (r2 cohort) ---
    "q_ts_ffill",
    "q_stream_live_session",
    "q_ts_ohlc",
    "q_ts_rolling_zscore",
    "q_stream_live_sliding",
    "q_udf_pandas",
    "q_udtf",
    "q_udaf_grouped",
    "q_udf_arrow",
    "q_dedup_fuzzy",
    "q_dedup_simhash",
    "q_dedup_fuzzy_jaccard",
    "q_sim_ann_ivf",
    "q_agg_approx_percentile",
    "q_agg_regr",
    # --- code changed in r10 ---
    "q_dedup_minhash_exact",
    "q_bpe_train_loop",
    "q_ngram_chars",
    "q_embed_bucket_stats",
    # --- new in r10 ---
    "q_dedup_substring",
    "q_bpe_encode",
    "q_graph_modularity",
    "q_text_readability",
    "q_ml_roc_points",
    "q_sample_neyman",
    "q_text_diversity",
    "q_ts_macd",
    "q_graph_assortativity",
    "q_ml_stump",
    "q_stream_live_minhash",
    "q_stream_live_spans",
    "q_ml_hard_negatives",
    "q_dq_homogeneity",
    "q_ml_ann_recall",
    "q_privacy_generalization",
    "q_vocab_growth",
    "q_ts_rsi",
    "q_dq_benford",
    "q_text_mixed_script",
    "q_zone_map_prune",
    "q_sample_ess",
    "q_sample_bootstrap",
    "q_graph_hits",
    "q_stream_live_benford",
    "q_join_spatial_grid",
    "q_ml_spearman",
    "q_ml_learning_curve",
    "q_ts_ordinal",
    "q_privacy_dp_hist",
    "q_dedup_cross_source",
)

#: earlier deferred queues, fully promoted (archived in
#: CORRECTNESS_r08/r09/r10.json respectively).
DEFERRED_R7: tuple[str, ...] = ()
DEFERRED_R8: tuple[str, ...] = ()
DEFERRED_R9: tuple[str, ...] = ()
DEFERRED_R10: tuple[str, ...] = ()

#: Queued to LEAD the round-11 graded window: first the four
#: newest r10 keys that no longer fit the 50-slot r10 window (new
#: keys outrank hygiene, but the VERDICT-prescribed DEFERRED_R10
#: head and the 4 changed keys outrank THEM — all four are green in
#: the full local sf0.01 differential meanwhile), then the 44-key
#: tail of the r3-cohort re-certification rotation (the late-r10
#: new-key batches displaced all 14 r10 fills).
DEFERRED_R11: tuple[str, ...] = (
    "q_ml_ks_separation",
    "q_text_burstiness",
    "q_ab_srm",
    "q_ab_cuped",
    "q_agg_bool",
    "q_cte_recursive",
    "q_doc_lm_score",
    "q_ewma",
    "q_fn_array",
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
    "q_subquery_lateral",
    "q_subquery_scalar",
    "q_values_inline",
    "q_win_ignorenulls",
    "q_win_range_interval",
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
        for k in (
            *GRADED_FIRST,
            *DEFERRED_R7,
            *DEFERRED_R8,
            *DEFERRED_R9,
            *DEFERRED_R10,
            *DEFERRED_R11,
        )
        if k not in merged.queries
    ]
    if missing:
        raise ValueError(
            f"GRADED_FIRST/DEFERRED keys not registered: {missing}"
        )
    overlap = set(GRADED_FIRST) & (
        set(DEFERRED_R7)
        | set(DEFERRED_R8)
        | set(DEFERRED_R9)
        | set(DEFERRED_R10)
        | set(DEFERRED_R11)
    )
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
    pinned = (
        set(GRADED_FIRST)
        | set(DEFERRED_R7)
        | set(DEFERRED_R8)
        | set(DEFERRED_R9)
        | set(DEFERRED_R10)
        | set(DEFERRED_R11)
    )
    for key in (
        *GRADED_FIRST,
        *DEFERRED_R7,
        *DEFERRED_R8,
        *DEFERRED_R9,
        *DEFERRED_R10,
        *DEFERRED_R11,
        *(k for k in merged.queries if k not in pinned),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
