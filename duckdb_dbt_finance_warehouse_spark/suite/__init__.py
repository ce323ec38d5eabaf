"""Driver-facing query suite.

Every operator from SURVEY.md §2 (plus the §7.6 extension surface) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame``
callable and, where SQL-expressible, an equivalent DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes the registry to the driver.
"""

from .registry import REGISTRY, QuerySpec, query

from . import core_relational  # noqa: E402,F401  (registers queries)
from . import extensions  # noqa: E402,F401

# The driver's correctness gate caps at the FIRST 50 registry entries in
# iteration order, so ordering is a verification-coverage decision, not
# cosmetics.  ROUND-9 ROTATION: (1) the one NEW entry
# (x_ann_ivf_pq_trained — the trained-codebook IVF-PQ composition),
# then (2) the full 38-entry r8 DEFERRED_NEXT_ROUND drain list, first
# slots exactly as promised (it includes x_fuzzy_join, whose in-row
# gram-array rework this round needs the re-check anyway), then
# (3) entries whose code or oracle changed this round — x_pagerank
# (int32 rank-dictionary iteration), x_ann_pq_trained / x_ann_pq_topk
# (vectorized list-form oracles), x_multimodal_features /
# x_multimodal_resize (real PNG decode + ASCII-invariant oracle guard)
# — then (4) the oldest remaining r6-green entries, biased toward the
# round's perf-watch list (substring_dedup drift A/B, basket_pairs /
# embed_drift / precision-audit floor class).
#
# After this round's run no registry entry's latest green driver row is
# older than r6; the r6 remainder moves to DEFERRED_NEXT_ROUND (r10's
# first slots), each still session-pinned by
# test_oracle_parity_deferred.py.  tests/test_coverage_rotation.py
# enforces that every registry entry is either driver-checked already,
# in the current first-50, or in the deferred plan (which must itself
# fit one round) — the "ships unchecked" failure mode cannot recur
# silently.
DRIVER_PRIORITY: list[str] = [
    # --- new entry this round ---
    "x_ann_ivf_pq_trained",
    # --- the r8 deferred drain list, first slots as declared ---
    "a10_salted_agg",
    "a11_pivot",
    "a12_unpivot",
    "a2_grouped_min_max",
    "a3_global_scalar_agg",
    "a5_conditional_count_distinct",
    "a6_select_distinct",
    "a7_spine_zero_fill",
    "a9_rollup",
    "f19_date_spine",
    "f_date_kit",
    "f_misc_scalars",
    "j2_left_equi_zero_fill",
    "j4_first_version_backfill",
    "j5_fk_anti_join",
    "j6_scalar_subquery_filter",
    "o1_ordered_topn",
    "o3_set_ops",
    "p10_predicate_filter",
    "p1_typed_projection",
    "p3_clean_strings",
    "p5_negative_to_null",
    "p6_record_hash",
    "p7_derived_boolean",
    "p8_hwm_filter",
    "s5_lineage_columns",
    "sql3_exists_q4_style",
    "sql4_recursive_spine",
    "w3_prior_history_flag",
    "w4_partition_min",
    "w5_rank_kit",
    "x_containment_pairs",
    "x_fuzzy_join",
    "x_leakage_safe_split",
    "x_ngram_jaccard",
    "x_quality_classifier",
    "x_sample_temperature",
    "x_simhash_near_dup",
    # --- code or oracle changed this round ---
    "x_pagerank",
    "x_ann_pq_trained",
    "x_ann_pq_topk",
    "x_multimodal_features",
    "x_multimodal_resize",
    "x_multimodal_audio",
    # --- oldest remaining driver rows (r6), perf-watch list first ---
    "x_substring_dedup",
    "x_basket_pairs",
    "x_embed_drift",
    "x_dedup_precision_audit",
    "sql10_having_in_q18_style",
]

# r6-green entries whose re-green did not fit this window; they take
# r10's first slots.  Adding a NEW queries() entry still requires a
# first-50 slot (CLAUDE.md) — this list only schedules cadence backlog
# that already has a green driver row.
DEFERRED_NEXT_ROUND: list[str] = [
    "a13_cube",
    "o4_null_ordering",
    "sql11_top_view_q15_style",
    "sql12_double_exists_q21_style",
    "sql5_correlated_agg_q17_style",
    "sql6_lateral_topk",
    "sql7_outer_join_histogram_q13_style",
    "sql8_correlated_min_q2_style",
    "sql9_global_avg_anti_join_q22_style",
    "w7_value_kit",
    "x_ab_conversion",
    "x_auc_quality",
    "x_bm25_search",
    "x_bpe_segment",
    "x_bpe_train",
    "x_corpus_profile",
    "x_corr_matrix",
    "x_dataset_overlap",
    "x_edit_distance",
    "x_embed_quantize",
    "x_event_anomaly",
    "x_event_paths",
    "x_event_transitions",
    "x_group_quantiles",
    "x_hll_error_audit",
    "x_hll_merge",
    "x_importance_resample",
    "x_join_size_estimate",
    "x_ks_drift",
    "x_last_touch_attribution",
    "x_lexical_drift",
    "x_lm_bigram_score",
    "x_pca_power",
    "x_perplexity_buckets",
    "x_random_projection",
    "x_shard_rendezvous",
    "x_skew_report",
    "x_zipf_fit",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
