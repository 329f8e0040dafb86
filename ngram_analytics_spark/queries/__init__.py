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

# The 50 keys the differential driver should grade first.  Round-4
# rotation: the 44 keys that have never sat inside a driver graded
# window (all registry keys minus the union of CORRECTNESS_r01–r03 —
# the round-3 additions: TPC-H composites, profiling/DQ, SCD2, the
# live-streaming twins, graph degree/triangles, layout/sampling/
# quality families, exact tf-idf, both new as-of directions) lead the
# window, so after this round every r3-era registry key holds at
# least one driver-green row (147 cumulative + 44 = 191; the round-4
# additions — q_join_overlap, q_dedup_incremental, q_mix_budget,
# q_embed_stats, q_ngram_novelty, q_attribution, q_ts_cusum,
# q_ts_holt, q_tpch_q21, q_tpch_q22, q_gdpr_cascade, q_join_bloom,
# q_agg_moments, q_vocab_coverage, q_agg_bitmap, q_stream_live_lww,
# q_ts_seasonal, q_agg_weighted_median, q_stream_session_dynamic,
# q_fn_map2, q_join_asof_tolerance, q_embed_cov,
# q_sink_dynamic_overwrite, q_paginate_keyset, q_fn_json2,
# q_stream_live_session_dynamic, q_fn_str_to_map, the TPC-H
# Q4/Q14/Q15/Q19 analogues, the TPC-H completion set
# (q_tpch_q1/q2/q6/q8/q9/q11/q12/q13/q16/q17/q20), q_pipeline_e2e,
# q_text_bm25, q_vocab_spectrum, q_ts_rolling_ndv, q_skew_profile,
# q_source_xml, q_stream_live_reach, q_fn_collation, q_udtf_poly,
# q_ml_sgd_step, q_fn_sql_udf, q_ml_gd_loop, q_graph_label_prop,
# q_text_keywords, q_fn_xpath, q_udf_cogroup, q_ts_twap,
# q_rfm_segment, and q_basket_lift — lead the round-5 rotation).  The
# remaining 6 slots re-certify: q_cte and q_anomaly_mad (official r3
# hash-FAIL, hardened this round to integer-tick arithmetic), and the
# q_sim_pairs / q_dedup_embed / _cluster / _canonical family whose
# physical plan moved to the block-pair GEMM after its r2-green row.
GRADED_FIRST: tuple[str, ...] = (
    # --- never driver-graded (registry order) ---
    "q_text_tfidf_exact",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_profile_table",
    "q_dq_checks",
    "q_scd2",
    "q_topk_salted",
    "q_sketch_countmin",
    "q_fn_crypto",
    "q_fn_levenshtein",
    "q_tpch_q18",
    "q_tpch_q7",
    "q_join_shuffle_hash",
    "q_ml_kmeans_step",
    "q_stream_live_dedup",
    "q_stream_live_join",
    "q_stream_live_pairjoin",
    "q_stream_foreach_upsert",
    "q_join_asof_fwd",
    "q_ts_rolling_median",
    "q_join_asof_nearest",
    "q_ts_pop",
    "q_user_transitions",
    "q_session_paths",
    "q_boilerplate",
    "q_shard_assign",
    "q_inverted_index",
    "q_graph_degree",
    "q_graph_triangles",
    "q_zorder_layout",
    "q_cdc_diff",
    "q_winsorize",
    "q_sample_weighted",
    "q_sample_reservoir",
    "q_incr_agg",
    "q_text_pii",
    "q_text_chunk",
    "q_text_entropy",
    "q_ts_islands",
    "q_agg_bitwise",
    "q_fn_format",
    "q_fn_binary",
    "q_dedup_paragraph",
    # --- re-certification: r3 hash-FAIL keys, hardened this round ---
    "q_cte",
    "q_anomaly_mad",
    # --- re-certification: plan changed (block-GEMM) since r2 green ---
    "q_sim_pairs",
    "q_dedup_embed",
    "q_dedup_cluster",
    "q_dedup_canonical",
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
    ordered = QueryRegistry()
    for key in (
        *GRADED_FIRST,
        *(k for k in merged.queries if k not in set(GRADED_FIRST)),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
