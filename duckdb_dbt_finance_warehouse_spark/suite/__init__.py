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
# cosmetics.  ROUND-8 ROTATION: (1) the two never-green entries, both
# FIXED this round — x_inverted_index (postings now a comma-joined
# scalar the driver canonicalizer can hash) and x_multimodal_features
# (first-ever value oracle: the ASCII corpus makes the stub decoder's
# byte stats DuckDB-expressible) — then (2) entries NEW or code-changed
# this round (x_multimodal_resize, x_ann_pq_trained, the integer-exact
# robust_z rewrite in x_mad_outliers, the dense_rank LSH top-k +
# merged-index persist on the LSH/IVF serving family, the int32
# rank-dictionary census), then (3) the 26-entry r7 deferred drain
# list, first slots as promised, then (4) the oldest remaining
# r5-green entries, biased toward the similarity/dedup subsystem whose
# shared code moved this round.
#
# With this window, every registry entry's latest green row is >= r5
# after this round's run; the r5 stragglers that did not fit move to
# DEFERRED_NEXT_ROUND (r9's first slots — cadence backlog, not
# never-checked debt; each is still pinned every session by
# test_oracle_parity_deferred.py).  tests/test_coverage_rotation.py
# enforces that every registry entry is either driver-checked already,
# in the current first-50, or in the deferred plan (which must itself
# fit one round) — the "ships unchecked" failure mode cannot recur
# silently.
DRIVER_PRIORITY: list[str] = [
    # --- never driver-green, both fixed this round ---
    "x_inverted_index",
    "x_multimodal_features",
    # --- new entries / code changed this round ---
    "x_multimodal_resize",
    "x_ann_pq_trained",
    "x_mad_outliers",
    "x_ann_lsh_incremental",
    "x_ann_ivf_incremental",
    "x_ann_lsh_probe_table",
    "x_ann_lsh_bucketed",
    "x_embed_near_dup",
    "x_triangle_count",
    "x_triangle_sample",
    # --- the r7 deferred drain list, first slots as declared ---
    "x_sessionize",
    "x_asof_nearest",
    "x_multimodal_bytestats",
    "x_text_langid",
    "x_text_quality",
    "x_token_count",
    "x_fingerprint",
    "x_tfidf_top_terms",
    "x_sample_hash",
    "x_sample_stratified",
    "x_sample_mixture",
    "x_decontaminate",
    "x_scrub_pii",
    "x_event_tumbling_window",
    "x_json_props",
    "x_resample_locf",
    "x_interval_overlap",
    "x_profile_stats",
    "x_winsorize",
    "x_heavy_hitters",
    "x_text_repetition",
    "x_bloom_semi_join",
    "x_quantile_sketch",
    "x_hll_by_group",
    "x_dedup_canonical",
    "x_pack_efficiency",
    # --- oldest remaining driver rows (r5), changed-subsystem first ---
    "x_dedup_exact",
    "x_dedup_minhash_lsh",
    "x_dedup_minhash_portable",
    "x_dedup_simhash",
    "x_ann_cosine_topk",
    "x_ann_ivf_topk",
    "x_semantic_dedup",
    "x_paragraph_dedup",
    "a4_multi_sum_rollup",
    "p9_topk_per_group",
    "w2_lag_prev_month",
    "sql2_join_agg_q5_style",
]

# r5-green entries whose re-green did not fit this window; they take
# r9's first slots.  Adding a NEW queries() entry still requires a
# first-50 slot (CLAUDE.md) — this list only schedules cadence backlog
# that already has a green driver row.
DEFERRED_NEXT_ROUND: list[str] = [
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
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
