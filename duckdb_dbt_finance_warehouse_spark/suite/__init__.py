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
# cosmetics.  ROUND-10 ROTATION: (1) the one NEW entry
# (x_multimodal_video — real YUV4MPEG2 decode), then (2) entries whose
# code or oracle changed this round — the real-resize pipeline and the
# spread_input-guarded synthesizers (x_multimodal_resize / _features /
# _audio), the exact-integer threshold rework (x_fuzzy_join /
# x_containment_pairs), the empty-graph guard (x_pagerank), and
# x_multimodal_frames (docstring-adjacent to the y4m work AND an r7
# row) — then (3) the full 38-entry r9 DEFERRED_NEXT_ROUND drain list,
# exactly as promised (it includes x_bm25_search / x_lm_bigram_score,
# the two r9-touched entries the r9 ADVICE flagged as shipping without
# a fresh driver green), then (4) the oldest remaining r7-green rows:
# the two flagships (m1/m2), the Q1-shape aggregate, and the
# CC-clustering iterative op.
#
# LATE-ROUND AMENDMENT (the r9-ADVICE touched-first rule): the sf1
# baseline work rewrote the kmeans and CC-closure ORACLES after the
# initial rotation, so x_kmeans / x_semantic_dedup / x_ann_ivf_trained
# / x_dedup_canonical / x_leakage_safe_split took window slots from
# five unchanged r6-backlog entries (a13_cube, o4_null_ordering,
# w7_value_kit, x_ks_drift, x_skew_report — moved to r11's deferred
# list, still r6-green and session-pinned). Declared deviation:
# changed-oracle entries outrank cadence backlog.
#
# After this round's run no registry entry's latest green driver row is
# older than r7 except the five displaced r6 entries above; the
# remainder moves to DEFERRED_NEXT_ROUND (r11's first slots), each
# still session-pinned by
# test_oracle_parity_deferred.py.  tests/test_coverage_rotation.py
# enforces that every registry entry is either driver-checked already,
# in the current first-50, or in the deferred plan (which must itself
# fit one round) — the "ships unchecked" failure mode cannot recur
# silently.
# SECOND LATE-ROUND AMENDMENT (same rule, continued session): six NEW
# entries (x_url_canonical / x_label_propagation / x_khop_reach /
# sql13 / sql14 / a14_grouping_sets) and three whose CODE changed late in the round
# (x_triangle_count / x_triangle_sample — broadcast closing join;
# sql2 — probe-stream join order; sql12's change is covered by its
# existing slot) take the first slots, displacing nine unchanged
# r7-green backlog entries (x_shard_rendezvous, x_zipf_fit,
# x_random_projection, x_perplexity_buckets, x_pca_power,
# x_last_touch_attribution, x_join_size_estimate, x_hll_merge,
# x_lexical_drift) onto
# DEFERRED_NEXT_ROUND — still session-pinned by
# test_oracle_parity_deferred, drained first in r11. Declared
# deviation: new and code-touched entries outrank cadence backlog.
DRIVER_PRIORITY: list[str] = [
    # --- new entries (second amendment) ---
    "x_url_canonical",
    "x_label_propagation",
    "x_khop_reach",
    "sql13_disjunctive_join_q19_style",
    "sql14_promo_ratio_q14_style",
    "a14_grouping_sets",
    # --- code changed late this round (second amendment) ---
    "x_triangle_count",
    "x_triangle_sample",
    "sql2_join_agg_q5_style",
    # --- new entry this round ---
    "x_multimodal_video",
    # --- code or oracle changed this round ---
    "x_multimodal_resize",
    "x_multimodal_features",
    "x_multimodal_audio",
    "x_multimodal_frames",
    "x_fuzzy_join",
    "x_containment_pairs",
    "x_pagerank",
    "x_kmeans",
    "x_semantic_dedup",
    "x_ann_ivf_trained",
    "x_dedup_canonical",
    "x_leakage_safe_split",
    # --- the r9 deferred drain list (minus five slots ceded to the
    # changed-oracle entries above — see the amendment note) ---
    "sql11_top_view_q15_style",
    "sql12_double_exists_q21_style",
    "sql5_correlated_agg_q17_style",
    "sql6_lateral_topk",
    "sql7_outer_join_histogram_q13_style",
    "sql8_correlated_min_q2_style",
    "sql9_global_avg_anti_join_q22_style",
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
    "x_importance_resample",
    "x_lm_bigram_score",
    # --- oldest remaining driver rows (r7): flagships first ---
    "m1_movement_classification",
    "m2_waterfall_rollup",
    "a1_grouped_sum_q1",
    "x_dedup_clusters",
]

# r7-green entries whose re-green did not fit this window; they take
# r11's first slots.  Adding a NEW queries() entry still requires a
# first-50 slot (CLAUDE.md) — this list only schedules cadence backlog
# that already has a green driver row.
DEFERRED_NEXT_ROUND: list[str] = [
    # displaced r6-green backlog (see the amendment note above)
    "a13_cube",
    "o4_null_ordering",
    "w7_value_kit",
    "x_ks_drift",
    "x_skew_report",
    # r7-green remainder
    "a8_exact_percentiles",
    "j1_month_spine_expansion",
    "j3_validity_asof_join",
    "sql1_join_agg_q3_style",
    "w1_latest_row_dedup",
    "w6_range_frames",
    "x_ann_ivf_pq_topk",
    "x_ann_ivf_probe_table",
    "x_ann_recall_audit",
    "x_boilerplate_grams",
    "x_chunk_overlap",
    "x_cohort_retention",
    "x_collocations",
    "x_curation_pipeline",
    "x_dedup_incremental",
    "x_event_funnel",
    "x_event_hopping_window",
    "x_ewma_smooth",
    "x_hard_negatives",
    "x_hll_distinct",
    "x_incremental_rollup",
    "x_kfold_split",
    "x_length_buckets",
    "x_maintenance_compaction",
    "x_max_concurrency",
    "x_merge_upsert",
    "x_negative_sampling",
    "x_pack_sequences",
    "x_rfm_segments",
    "x_salted_join",
    "x_semantic_decontaminate",
    "x_snapshot_diff",
    "x_table_fingerprint",
    "x_tokenizer_fertility",
    "x_vocab_coverage",
    "x_zorder_layout",
    # displaced r7-green backlog (second amendment — see above)
    "x_lexical_drift",
    "x_shard_rendezvous",
    "x_zipf_fit",
    "x_random_projection",
    "x_perplexity_buckets",
    "x_pca_power",
    "x_last_touch_attribution",
    "x_join_size_estimate",
    "x_hll_merge",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
