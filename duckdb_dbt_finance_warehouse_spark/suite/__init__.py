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
# cosmetics.  ROUND-14 ROTATION (CLAUDE.md rule: never-checked first,
# then this round's touched entries, then the stalest greens):
#   slots 1-8   — the r13 verdict's touched-but-driver-unverified list
#                 (verdict #3): entries whose r13-changed code no
#                 driver gate has ever seen (containment's md5-half
#                 keys, the memoized BPE trains, the IVF/PQ stored
#                 index servers, fuzzy join).
#   slots 9-19  — entries whose operators r14's code touches
#                 semantically: the in-row signature/simhash Arrow
#                 kernels (whole dedup family), the a8 percentile
#                 rewrite, ngram_jaccard's shared subtrees, the
#                 group-arrow signature minima (dataset_overlap).
#   slots 20-43 — r13's DEFERRED_NEXT_ROUND drains completely
#                 (24 entries after the x_ann_pq_topk overlap with
#                 slot 7's drain).
#   slots 44-50 — r14-touched with semantics-neutral changes (frozen
#                 model setflags, census deg threading): re-verified
#                 anyway since their modules changed.
DRIVER_PRIORITY: list[str] = [
    # --- r13 touched-but-unverified drain (r13 VERDICT #3) ---
    "x_containment_pairs",
    "x_bpe_train",
    "x_bpe_train_batched",
    "x_ann_ivf_pq_topk",
    "x_ann_ivf_probe_table",
    "x_ann_ivf_incremental",
    "x_ann_pq_topk",
    "x_fuzzy_join",
    # --- r14 semantically-touched (in-row kernels, a8 rewrite,
    #     ngram_jaccard restructure, group-arrow minima) ---
    "a8_exact_percentiles",
    "x_ngram_jaccard",
    "x_dedup_simhash",
    "x_simhash_near_dup",
    "x_dedup_minhash_portable",
    "x_dedup_minhash_lsh",
    "x_dedup_clusters",
    "x_dedup_canonical",
    "x_dedup_incremental",
    "x_dedup_precision_audit",
    "x_leakage_safe_split",
    "x_dataset_overlap",
    # --- r13 deferred drain (r13-displaced r9-green rows) ---
    "w5_rank_kit",
    "x_basket_pairs",
    "x_embed_drift",
    "x_quality_classifier",
    "x_sample_temperature",
    "x_substring_dedup",
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
    "sql4_recursive_spine",
    "w3_prior_history_flag",
    "w4_partition_min",
    # --- r14 semantics-neutral touches (setflags-frozen models, census
    #     deg threading / memo hygiene) ---
    "x_kmeans",
    "x_ann_pq_trained",
    "x_ann_ivf_pq_trained",
    "x_ann_ivf_trained",
    "x_triangle_count",
    "x_triangle_auto",
    "x_triangle_sample",
]

# Entries r14's code touches (semantically or mechanically) that do NOT
# fit the 50-entry window this round — the rotation policy's overflow
# rule made executable (r13 VERDICT #9): tests assert
# TOUCHED_THIS_ROUND ∖ window ⊆ DEFERRED_NEXT_ROUND.
DEFERRED_NEXT_ROUND: list[str] = [
    # error-guard-only change (probe_pred + prune_to_probed rejection);
    # driver-green r13 on the same serving shape
    "x_ann_lsh_probe_table",
]

# Every queries() entry whose operator code this round's diff touches —
# kept in suite code (not prose) so the window policy is testable.
TOUCHED_THIS_ROUND: list[str] = [
    # in-row Arrow signature kernels + ngram_jaccard restructure +
    # group-arrow minima (operators/dedup.py)
    "a8_exact_percentiles",
    "x_ngram_jaccard",
    "x_dedup_simhash",
    "x_simhash_near_dup",
    "x_dedup_minhash_portable",
    "x_dedup_minhash_lsh",
    "x_dedup_clusters",
    "x_dedup_canonical",
    "x_dedup_incremental",
    "x_dedup_precision_audit",
    "x_leakage_safe_split",
    "x_dataset_overlap",
    # frozen-model setflags (operators/kmeans.py, pq.py)
    "x_kmeans",
    "x_ann_pq_trained",
    "x_ann_ivf_pq_trained",
    "x_ann_ivf_trained",
    # census deg threading + ad-hoc-route memo hygiene (operators/graph.py)
    "x_triangle_count",
    "x_triangle_auto",
    "x_triangle_sample",
    # probe_pred + prune_to_probed guard (operators/similarity.py)
    "x_ann_lsh_probe_table",
]


def _apply_driver_order() -> None:
    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_order()

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "DRIVER_PRIORITY",
    "DEFERRED_NEXT_ROUND",
    "TOUCHED_THIS_ROUND",
]
