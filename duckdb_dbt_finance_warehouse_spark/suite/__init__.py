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
# cosmetics.  DRIVER_PRIORITY front-loads (a) every entry that has never
# had a driver-green CORRECTNESS row through round 3 and (b) this round's
# new entries, then back-fills with the least-checked older entries and a
# band of high-complexity flagships that we want re-proven each round.
# Entries not listed keep their registration order after the priority
# block; all 82+ still run in pytest / tools/check_correctness.py.
DRIVER_PRIORITY: list[str] = [
    # -- never driver-checked through r3 (VERDICT r3 gap #1) --
    "x_token_count",
    "x_fingerprint",
    "x_tfidf_top_terms",
    "x_embed_near_dup",
    "x_sample_hash",
    "x_sample_stratified",
    "x_sample_mixture",
    "x_decontaminate",
    "x_scrub_pii",
    "x_hll_distinct",
    "x_sessionize",
    "x_event_tumbling_window",
    "x_json_props",
    "x_asof_nearest",
    "x_resample_locf",
    "x_interval_overlap",
    "x_profile_stats",
    "x_winsorize",
    "x_multimodal_features",
    "x_multimodal_bytestats",
    "x_heavy_hitters",
    "x_text_repetition",
    "x_bloom_semi_join",
    "x_quantile_sketch",
    "x_hll_by_group",
    "x_kmeans",
    "x_ann_ivf_trained",
    "x_dedup_canonical",
    "x_curation_pipeline",
    # -- new this round (never checked by construction) --
    "x_dedup_incremental",
    "x_ann_ivf_probe_table",
    "x_ann_lsh_probe_table",
    "x_maintenance_compaction",
    "x_pack_sequences",
    "x_pack_efficiency",
    "x_snapshot_diff",
    # -- checked in only one or two prior rounds --
    "x_text_langid",
    "x_text_quality",
    "x_salted_join",
    "x_ann_lsh_bucketed",
    "x_dedup_clusters",
    "w6_range_frames",
    # -- flagship band: complex plans we want re-proven every round --
    "m1_movement_classification",
    "m2_waterfall_rollup",
    "sql1_join_agg_q3_style",
    "j1_month_spine_expansion",
    "j3_validity_asof_join",
    "a1_grouped_sum_q1",
    "w1_latest_row_dedup",
    "a8_exact_percentiles",
    "x_dedup_minhash_lsh",
    "x_ann_ivf_topk",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = ["REGISTRY", "QuerySpec", "query", "DRIVER_PRIORITY"]
