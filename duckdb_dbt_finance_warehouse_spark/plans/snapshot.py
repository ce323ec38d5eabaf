"""SCD2 snapshot — dbt ``check``-strategy merge (SURVEY §7.4, D8).

Reference config (snapshots/snap_accounts.sql:3-11): ``strategy='check',
check_cols=['record_hash'], unique_key=<natural key>,
invalidate_hard_deletes=true``. Public dbt-core semantics per run:

- key only in source          -> INSERT new open version
- key in both, hash equal     -> keep the open row unchanged
- key in both, hash differs   -> CLOSE old version + INSERT new open one
- key only in snapshot (hard delete) -> CLOSE the open version

Determinism deviation (documented): dbt stamps ``dbt_valid_from`` /
``dbt_valid_to`` with the snapshot run's wall clock; here versions open
at the row's own ``ingested_at`` and close at the incoming row's
``ingested_at`` (hard deletes close at the batch's max ``ingested_at``).
Downstream consumers only use month-truncated validity plus the
1900-01-01 first-version backfill (fct_subscription_month.sql:104-137),
so this is observationally equivalent for all marts while making reruns
reproducible.

Scale: one full-outer shuffle join on the natural key between the OPEN
slice of the snapshot and the deduped current view — closed history is
never rejoined, only unioned back (append-only cold data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import Context, Model


def scd2_merge(
    old: DataFrame | None,
    new: DataFrame,
    unique_key: str,
    check_col: str = "record_hash",
    batch_ts_col: str = "ingested_at",
    run_ts=None,
) -> DataFrame:
    """Pure-DataFrame SCD2 merge; returns the full new snapshot state.

    ``run_ts`` (optional) is the close timestamp for hard deletes when
    the incoming batch is EMPTY (no rows -> no batch max to close at).
    Without it an empty batch returns the state unchanged rather than
    silently closing rows at NULL (which would leave them open forever)."""
    new = new.withColumn("dbt_valid_from", F.col(batch_ts_col)).withColumn(
        "dbt_valid_to", F.lit(None).cast("timestamp")
    )
    # A NULL natural key matches NOTHING in the full-outer merge (NULL
    # == NULL is NULL): a stored NULL-key open row would silently
    # VANISH from the merged state and an incoming one would be
    # silently discarded — data loss, not a test failure. The declared
    # not_null test only REPORTS; the merge must refuse. One eager agg
    # (shared with the hard-delete close timestamp below).
    stats = new.agg(
        F.max(batch_ts_col).alias("_ts"),
        F.count(F.when(F.col(unique_key).isNull(), 1)).alias("_nulls"),
    ).first()
    if stats["_nulls"]:
        raise ValueError(
            f"scd2_merge: {stats['_nulls']} incoming row(s) with NULL "
            f"{unique_key} — fix the source (a NULL key cannot be merged)"
        )
    if old is None:
        return new

    closed_history = old.filter(F.col("dbt_valid_to").isNotNull())
    open_rows = old.filter(F.col("dbt_valid_to").isNull())
    if open_rows.filter(F.col(unique_key).isNull()).limit(1).count():
        raise ValueError(
            f"scd2_merge: stored snapshot contains open row(s) with NULL "
            f"{unique_key} — a pre-guard state; repair before merging"
        )

    # hard-delete close timestamp: the incoming batch's max ingested_at
    batch_ts = stats["_ts"]
    if batch_ts is None:
        # empty batch: nothing to insert/change; every open key would be
        # a "hard delete" — only close them if the caller supplied a
        # deterministic run timestamp, else keep the state as-is
        if run_ts is None:
            return old
        batch_ts = run_ts

    o = open_rows.alias("o")
    n = new.alias("n")
    # five branches filter this ONE join — without a checkpoint the
    # sort-merge join executes five times (ReuseExchange only dedupes
    # the shuffle reads). localCheckpoint, not persist: per-run
    # recomputed state, never a stored table (CLAUDE.md cache rule).
    j = o.join(
        n, F.col(f"o.{unique_key}") == F.col(f"n.{unique_key}"), "full_outer"
    ).localCheckpoint(eager=False)

    in_old = F.col(f"o.{unique_key}").isNotNull()
    in_new = F.col(f"n.{unique_key}").isNotNull()
    # null-safe: a NULL record_hash on either side must count as a change
    # (plain != yields NULL -> silently "unchanged")
    changed = (
        in_old
        & in_new
        & ~F.col(f"o.{check_col}").eqNullSafe(F.col(f"n.{check_col}"))
    )

    old_cols = [F.col(f"o.{c}").alias(c) for c in open_rows.columns if c != "dbt_valid_to"]
    new_cols = [F.col(f"n.{c}").alias(c) for c in new.columns]

    # unchanged open rows pass through; changed/deleted get closed
    kept_open = j.filter(in_old & in_new & ~changed).select(
        *old_cols, F.lit(None).cast("timestamp").alias("dbt_valid_to")
    )
    closed_changed = j.filter(changed).select(
        *old_cols, F.col(f"n.{batch_ts_col}").alias("dbt_valid_to")
    )
    closed_deleted = j.filter(in_old & ~in_new).select(
        *old_cols, F.lit(batch_ts).cast("timestamp").alias("dbt_valid_to")
    )
    inserts_new = j.filter(~in_old & in_new).select(*new_cols)
    inserts_changed = j.filter(changed).select(*new_cols)

    return (
        closed_history.unionByName(kept_open)
        .unionByName(closed_changed)
        .unionByName(closed_deleted)
        .unionByName(inserts_new)
        .unionByName(inserts_changed)
    )


def run_snapshot(ctx: Context, m: Model) -> None:
    """Materialize a snapshot model: fn(ctx) yields the CURRENT rows
    (from the deduped int_*_current view); merge into the stored state."""
    new = m.fn(ctx)
    old = ctx.wh.read(m.schema, m.name) if ctx.wh.exists(m.schema, m.name) else None
    key = m.unique_key[0]
    merged = scd2_merge(old, new, unique_key=key)
    # the merge reads the files it is about to replace -> staged write +
    # directory swap: old state stays durable until the new one is
    ctx.wh.write_staged(merged, m.schema, m.name)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: list[str], hash_col: str = "record_hash"
) -> DataFrame:
    """Audit diff of two table states — the inspection half of the SCD2
    merge above: which keys were added / removed / changed between two
    snapshots (per-row content identity via ``hash_col``, the same
    record-hash contract as the check-strategy merge, P6).

    One co-partitioned full-outer shuffle join on the key; only keys +
    hashes travel, never the payload columns. Rows whose content is
    unchanged are dropped (the interesting output is the delta, and at
    100 TB the unchanged set is the overwhelming majority)."""
    # presence is tracked with explicit flags, NOT hash-NULLness, and
    # the change test is null-safe: with a nullable hash_col the old
    # form misfiled present-rows-with-NULL-hash as added/removed and
    # dropped a NULL-vs-NULL change as "unchanged" (plain != -> NULL)
    o = old.select(
        *key_cols, F.col(hash_col).alias("_old_h"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        *key_cols, F.col(hash_col).alias("_new_h"), F.lit(True).alias("_in_new")
    )
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~F.col("_old_h").eqNullSafe(F.col("_new_h")), "changed")
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
