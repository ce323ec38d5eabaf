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
# cosmetics.  ROUND-7 ROTATION: after r6, every registry entry except
# the 21 on the r6 deferred list had a green driver row, so r7's window
# is (1) that declared drain list — its entries take the first slots
# exactly as promised in r6 — then (2) every entry whose CODE CHANGED
# this round (the new incremental-IVF/LSH and PQ/IVF-PQ entries; the
# four LSH entries migrated from fixed 8x4 planes to corpus-sized
# lsh_planes_for planes plus the two refactor-touched serving entries;
# the bounded-probe bucket prune on decontaminate/recall-audit; the
# one-pass floor-division RFM rewrite), then (3) the §2 flagships last green r4,
# now at the two-round re-green cadence (CLAUDE.md), then (4) the
# oldest remaining r4-green entries, biased toward subsystems whose
# shared code moved this round (similarity/dedup lifecycle, sketch,
# packing/maintenance).  x_multimodal_features stays OUT permanently —
# it can only ever report no_oracle (plumbing is oracle-verified via
# x_multimodal_bytestats); it would waste a slot.
#
# With this window, NOTHING in the registry has a stale driver row
# older than r4, and the r4 stragglers that did not fit move to
# DEFERRED_NEXT_ROUND (r8's first slots — all already driver-green in
# r4, so this is re-green cadence backlog, not never-checked debt; each
# is still pinned every session by test_oracle_parity_deferred.py).
# tests/test_coverage_rotation.py enforces that every registry entry is
# either driver-checked already, in the current first-50, or in the
# deferred plan (which must itself fit one round) — the "ships
# unchecked" failure mode cannot recur silently.
DRIVER_PRIORITY: list[str] = [
    # --- the r6 deferred drain list, first slots as declared ---
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
    # --- code changed this round ---
    "x_ann_ivf_incremental",
    "x_ann_lsh_incremental",
    "x_ann_pq_topk",
    "x_ann_ivf_pq_topk",
    "x_ann_lsh_bucketed",
    "x_embed_near_dup",
    "x_ann_recall_audit",
    "x_ann_lsh_probe_table",
    "x_ann_ivf_probe_table",
    "x_rfm_segments",
    # --- §2 flagships at the two-round cadence (last green r4) ---
    "m1_movement_classification",
    "m2_waterfall_rollup",
    "j1_month_spine_expansion",
    "j3_validity_asof_join",
    "a1_grouped_sum_q1",
    "w1_latest_row_dedup",
    "sql1_join_agg_q3_style",
    # --- oldest remaining driver rows (r4), changed-subsystem first ---
    "x_ann_ivf_trained",
    "x_kmeans",
    "x_dedup_incremental",
    "x_dedup_clusters",
    "x_curation_pipeline",
    "x_hll_distinct",
    "x_salted_join",
    "a8_exact_percentiles",
    "w6_range_frames",
    "x_pack_sequences",
    "x_snapshot_diff",
    "x_maintenance_compaction",
]

# r4-green entries whose re-green did not fit this window; they take
# r8's first slots.  Adding a NEW queries() entry still requires a
# first-50 slot (CLAUDE.md) — this list only schedules cadence backlog
# that already has a green driver row.
DEFERRED_NEXT_ROUND: list[str] = [
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
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
