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

# The 50 keys the differential driver should grade first.  Round-7
# rotation (VERDICT r6 "Next round" item 1): the two DEFERRED_R7 keys
# lead (never driver-graded; q_sketch_bloom_exact's word-index was
# re-spelled to integer `div` this round per item 3), followed by the
# seven keys NEW in r7 (certified count-min twin, certified IVF-ANN
# twin, JL sign projection, BPE merge scan, k-anonymity census,
# unrolled BFS, and the forced-LSH similarity branch — rows-only by
# design), then the two r7 re-certifications (q_dedup_minhash_exact's
# hot-band restructure, q_ts_rolling_median's floor() spelling).
# With every registry key already holding >=1 driver-green row after
# r6, the remaining 39 slots begin the oldest-first re-certification
# rotation: the r1-certified cohort (code-stable since r1, judge-green
# in every local differential since) rotates back through the window;
# its tail continues in DEFERRED_R8.
GRADED_FIRST: tuple[str, ...] = (
    # --- never driver-graded: the r6 DEFERRED_R7 queue ---
    "q_sketch_bloom_exact",
    "q_ts_backtest",
    # --- new in r7 ---
    "q_sketch_countmin_exact",
    "q_sim_ann_ivf_exact",
    "q_embed_rp",
    "q_bpe_pair_counts",
    "q_privacy_kanon",
    "q_graph_bfs",
    "q_sim_pairs_lsh",
    # --- re-certification: code changed in r7 ---
    "q_dedup_minhash_exact",
    "q_ts_rolling_median",
    "q_ts_cross_corr",
    "q_ml_auc",
    "q_source_binary",
    "q_ml_confusion",
    "q_ml_mrr",
    "q_ngram_kneser_ney",
    "q_text_cloze",
    "q_attribution_decay",
    # --- oldest-first re-certification: the r1 cohort ---
    "q_ngram_bigram",
    "q_ngram_trigram",
    "q_ngram_fewer_tokens",
    "q_tokenize",
    "q_text_stats",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_ngram_chars",
    "q_text_collocation",
    "q_ngram_skipgram",
    "q_scan_project",
    "q_scan_count",
    "q_filter_pred",
    "q_expr_case",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta",
    "q_join_multiway",
    "q_join_interval",
    "q_agg_global",
    "q_agg_group",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_having",
)

#: r6's deferred queue is fully promoted into the r7 window above.
DEFERRED_R7: tuple[str, ...] = ()

#: Tail of the r1-cohort re-certification rotation — queued at
#: positions 51+ so they lead the round-8 graded window.
DEFERRED_R8: tuple[str, ...] = (
    "q_win_analytic",
    "q_win_rank",
    "q_win_frame",
    "q_sort_limit",
    "q_topk_pergroup",
    "q_set_union",
    "q_set_intersect",
    "q_set_except",
    "q_pivot",
    "q_unpivot",
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
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
        for k in (*GRADED_FIRST, *DEFERRED_R7, *DEFERRED_R8)
        if k not in merged.queries
    ]
    if missing:
        raise ValueError(
            f"GRADED_FIRST/DEFERRED keys not registered: {missing}"
        )
    overlap = set(GRADED_FIRST) & (set(DEFERRED_R7) | set(DEFERRED_R8))
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
    pinned = set(GRADED_FIRST) | set(DEFERRED_R7) | set(DEFERRED_R8)
    for key in (
        *GRADED_FIRST,
        *DEFERRED_R7,
        *DEFERRED_R8,
        *(k for k in merged.queries if k not in pinned),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
