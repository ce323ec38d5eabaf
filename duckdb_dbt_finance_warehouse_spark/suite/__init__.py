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
# cosmetics.  ROUND-11 ROTATION — the verification-cadence round the r10
# verdict mandated: the full 50-entry DEFERRED_NEXT_ROUND backlog
# drains here (the backlog is in fact 50 entries — the r10 verdict's
# "49 ... one slot spare" was an off-by-one), 14 r6-green entries
# first (5 rounds unchecked), then the r7-green remainder — with ONE
# swap: x_interval_overlap takes a slot because it is BOTH backlog-
# stale (r8-green, the oldest row among this round's touched entries)
# AND semantically reworked this round (the first-shared-bucket dedup
# replaced the DISTINCT; duplicate-id inputs now pass through — the
# r11 review flagged shipping that combination unchecked as the exact
# failure mode the rotation rule exists for). x_zorder_layout
# (r7-green, untouched for four rounds, own pytest pins) cedes the
# slot and leads r12's deferred list.
#
# DECLARED DEVIATION (inverse of r10's): this round, cadence backlog
# OUTRANKS code-touched entries that already hold an r10 driver green.
# The r10 verdict's top action item was "drain the backlog completely;
# r11 must be a verification-cadence round" — the entries this round's
# perf/robustness work touches (x_triangle_sample / x_triangle_count,
# x_url_canonical, x_multimodal_resize / _features,
# x_containment_pairs) all hold r10 driver greens (the freshest rows in
# the registry), every change is result-identical by construction and
# pinned by the local 185-entry oracle gate + pytest this session, and
# they lead r12's DEFERRED_NEXT_ROUND below.  sql3_exists_q4_style
# (r9-green, touched by the floor A/B) likewise defers to r12.
DRIVER_PRIORITY: list[str] = [
    # --- r6-green backlog: 5 rounds unchecked, oldest rows first ---
    "a13_cube",
    "o4_null_ordering",
    "w7_value_kit",
    "x_ks_drift",
    "x_skew_report",
    "x_hll_merge",
    "x_join_size_estimate",
    "x_lexical_drift",
    "x_pca_power",
    "x_perplexity_buckets",
    "x_random_projection",
    "x_shard_rendezvous",
    "x_zipf_fit",
    "x_last_touch_attribution",
    # --- r7-green backlog remainder ---
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
    # --- swapped in: r8-green AND semantically reworked this round ---
    "x_interval_overlap",
]

# Entries touched by this round's perf/robustness work that could not
# take first-50 slots without re-displacing the backlog (see the
# declared deviation above).  All hold r9/r10 driver greens and are
# session-pinned by the local oracle gate; they take r12's first slots.
# Adding a NEW queries() entry still requires a first-50 slot
# (CLAUDE.md) — this list only schedules re-verification.
DEFERRED_NEXT_ROUND: list[str] = [
    "x_zorder_layout",
    "sql3_exists_q4_style",
    "sql10_having_in_q18_style",
    "x_triangle_sample",
    "x_triangle_count",
    "x_url_canonical",
    "x_label_propagation",
    "x_multimodal_resize",
    "x_multimodal_features",
    "x_containment_pairs",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
