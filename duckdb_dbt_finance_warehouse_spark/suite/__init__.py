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
# cosmetics.  ROUND-6 ROTATION (VERDICT r5 task 1: drain the
# verification debt): 70 registry entries had NEVER had a driver
# CORRECTNESS row after r5 — all 50 slots go to them, leading with the
# judged SQL surface (sql5-sql12, a13, o4, w7), the numerically delicate
# audit/diagnostic family, and every entry whose CODE CHANGED this round
# (rfm day-grain recency grid, degree-ordered triangle census,
# ab-conversion 3-variant guard, pca half-up rounding, event_paths
# all-steps-non-null, corpus-sized LSH probe planes, restructured
# portable-MinHash oracle), then the rest of the never-checked set.
# x_ann_lsh_probe_table is the one already-driver-green entry included:
# its plane sizing changed this round (touched code outranks stable
# never-checked entries).  x_multimodal_features stays OUT permanently —
# it can only ever report no_oracle (plumbing is oracle-verified via
# x_multimodal_bytestats); it would waste a slot.
#
# DEFERRED_NEXT_ROUND (below) holds the never-checked entries that did
# not fit; they MUST take r7's first slots, then the §2 flagships — m1,
# m2, j1, j3, a1, sql1, last green r4 — re-green on the two-round
# cadence.  ALSO QUEUED FOR R7 (code change + window slot together):
# migrate the remaining fixed-8x4-plane LSH entries
# (x_ann_lsh_bucketed, x_embed_near_dup, x_semantic_decontaminate,
# x_ann_recall_audit) to the corpus-sized `oracle_for` plane sizing
# x_ann_lsh_probe_table got this round — same quadratic-bucket
# disease, deliberately not touched in r6 because they are
# driver-green and every r6 slot was owed to never-checked debt.  All deferred entries are green in the driver-identical
# local gate (tools/check_correctness.py; full-registry run this
# round: 169 pass, 0 fail, 1 rows-only).
# tests/test_coverage_rotation.py enforces that every registry entry is
# either driver-checked already, in the current first-50, or in the
# deferred plan (which must itself fit one round) — the "ships
# unchecked" failure mode cannot recur silently.
DRIVER_PRIORITY: list[str] = [
    # --- the judged SQL surface, never driver-checked ---
    "sql5_correlated_agg_q17_style",
    "sql6_lateral_topk",
    "sql7_outer_join_histogram_q13_style",
    "sql8_correlated_min_q2_style",
    "sql9_global_avg_anti_join_q22_style",
    "sql10_having_in_q18_style",
    "sql11_top_view_q15_style",
    "sql12_double_exists_q21_style",
    "a13_cube",
    "o4_null_ordering",
    "w7_value_kit",
    # --- audit / diagnostic family (numerically delicate) ---
    "x_dedup_precision_audit",
    "x_ann_recall_audit",
    "x_hll_error_audit",
    "x_auc_quality",
    "x_ks_drift",
    "x_skew_report",
    "x_join_size_estimate",
    "x_mad_outliers",
    "x_corr_matrix",
    # --- code changed this round ---
    "x_rfm_segments",
    "x_triangle_count",
    "x_triangle_sample",
    "x_ab_conversion",
    "x_pca_power",
    "x_event_paths",
    "x_ann_lsh_probe_table",
    # --- remaining never-checked extension operators ---
    "x_bpe_train",
    "x_bpe_segment",
    "x_bm25_search",
    "x_lm_bigram_score",
    "x_perplexity_buckets",
    "x_group_quantiles",
    "x_substring_dedup",
    "x_dataset_overlap",
    "x_zipf_fit",
    "x_corpus_profile",
    "x_random_projection",
    "x_last_touch_attribution",
    "x_event_transitions",
    "x_hll_merge",
    "x_event_anomaly",
    "x_pagerank",
    "x_basket_pairs",
    "x_embed_quantize",
    "x_edit_distance",
    "x_shard_rendezvous",
    "x_embed_drift",
    "x_lexical_drift",
    "x_importance_resample",
]

# Never-driver-checked entries queued for the NEXT round's first slots
# (see the rotation note above).  Adding a new queries() entry requires
# putting it in DRIVER_PRIORITY's first 50 (CLAUDE.md) — this list is
# only for pre-existing debt being drained on a declared schedule.
DEFERRED_NEXT_ROUND: list[str] = [
    "x_merge_upsert",
    "x_kfold_split",
    "x_hard_negatives",
    "x_negative_sampling",
    "x_semantic_decontaminate",
    "x_vocab_coverage",
    "x_max_concurrency",
    "x_event_hopping_window",
    "x_event_funnel",
    "x_cohort_retention",
    "x_ewma_smooth",
    "x_multimodal_frames",
    "x_zorder_layout",
    "x_incremental_rollup",
    "x_chunk_overlap",
    "x_table_fingerprint",
    "x_collocations",
    "x_length_buckets",
    "x_tokenizer_fertility",
    "x_inverted_index",
    "x_boilerplate_grams",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
