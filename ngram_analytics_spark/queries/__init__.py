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

# The 50 keys the differential driver should grade first.  Round-9
# rotation (VERDICT r8 "Next round" item 2): DEFERRED_R9's oldest-
# first r2-cohort head leads (20 keys — the queue held 35; the window
# also had to carry this round's 18 code-changed keys and 12 new
# keys, so the queue's tail of 14 moves to DEFERRED_R10 below —
# changed/new keys outrank hygiene re-certification because they are
# the only rows with correctness RISK; every deferred key is
# judge-green in each round's full local differential).  Then the 17
# keys whose code or oracle changed in r9: the q_text_cooc offset-
# lattice rewrite, q_sim_pairs_lsh (oracle off-dim guard + the
# rp_signatures factoring), q_schema_evolution (app-id temp path),
# the 14 tokenizer-hoisting fixes from the long-document probe, and
# q_attribution_decay (the skew probe's one flag — day-offset
# lattice + spread rewrite).  Last, the 12 keys NEW in r9.
GRADED_FIRST: tuple[str, ...] = (
    # --- oldest-first re-certification: DEFERRED_R9 head (r2 cohort) ---
    "q_agg_histogram",
    "q_join_salted",
    "q_agg_salted",
    "q_join_nullsafe",
    "q_join_bucketed",
    "q_scan_partitioned",
    "q_join_dpp",
    "q_dedup_exact",
    "q_sim_knn",
    "q_multimodal_join",
    "q_multimodal_meta",
    "q_multimodal_frames",
    "q_ml_scaler",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_join_asof",
    "q_ts_resample",
    "q_ts_gapfill",
    "q_stream_live_tumbling",
    # --- code/oracle changed in r9 ---
    "q_attribution_decay",
    "q_text_cooc",
    "q_sim_pairs_lsh",
    "q_schema_evolution",
    "q_ngram_skipgram",
    "q_ngram_chars",
    "q_text_repetition",
    "q_text_fingerprint",
    "q_text_fingerprint_exact",
    "q_text_cloze",
    "q_dedup_jaccard",
    "q_dedup_containment",
    "q_dedup_minhash_exact",
    "q_boilerplate",
    "q_decontam",
    "q_ngram_novelty",
    "q_pipeline_e2e",
    "q_sketch_bloom_exact",
    # --- new in r9 ---
    "q_bpe_train_loop",
    "q_stream_foreach_ab",
    "q_ml_mcc",
    "q_ml_brier",
    "q_ml_ndcg",
    "q_ml_target_encode",
    "q_ml_cv_folds",
    "q_graph_clustering_coeff",
    "q_privacy_tcloseness",
    "q_ts_bollinger",
    "q_sample_negative",
    "q_embed_bucket_stats",
)

#: r7's deferred queue was fully promoted into the r8 window; r8's
#: window is archived in CORRECTNESS_r08.json.
DEFERRED_R7: tuple[str, ...] = ()
DEFERRED_R8: tuple[str, ...] = ()
DEFERRED_R9: tuple[str, ...] = ()

#: Tail of the r2-cohort re-certification rotation (the 14 DEFERRED_R9
#: keys the r9 window had no room for — see the GRADED_FIRST comment)
#: — queued so they lead the round-10 graded window.
DEFERRED_R10: tuple[str, ...] = (
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
        for k in (*GRADED_FIRST, *DEFERRED_R7, *DEFERRED_R8, *DEFERRED_R9)
        if k not in merged.queries
    ]
    if missing:
        raise ValueError(
            f"GRADED_FIRST/DEFERRED keys not registered: {missing}"
        )
    overlap = set(GRADED_FIRST) & (
        set(DEFERRED_R7) | set(DEFERRED_R8) | set(DEFERRED_R9)
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
    )
    for key in (
        *GRADED_FIRST,
        *DEFERRED_R7,
        *DEFERRED_R8,
        *DEFERRED_R9,
        *(k for k in merged.queries if k not in pinned),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
