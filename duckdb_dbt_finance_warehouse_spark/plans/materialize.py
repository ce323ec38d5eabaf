"""Materialization policies (SURVEY §7.3).

Scale design notes:

- ``incremental_delete_insert`` with a partition key is DYNAMIC PARTITION
  OVERWRITE: the recomputed months replace exactly their partitions; the
  rest of a 100 TB fact table is untouched. Requires
  ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set in both the
  session factory and defensively here).
- The keyed fallback (anti-join + union + full rewrite) reproduces dbt's
  delete+insert for arbitrary unique keys but rewrites the table — kept
  for parity, not the scale path.
- ``incremental_append`` writes only the new batch's rows; the
  high-watermark filter itself lives in the model function (it is model
  logic, as in the reference: stg_accounts.sql:9-11).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import Context, Model


def materialize(ctx: Context, m: Model) -> None:
    if m.materialization == "view":
        return  # resolved lazily via ctx.ref

    if m.materialization == "snapshot":
        from .snapshot import run_snapshot

        run_snapshot(ctx, m)
        return

    df = m.fn(ctx)

    if m.materialization == "table" or not ctx.is_incremental(m.name):
        # a FULL build (table policy, first build, or --full-refresh)
        # must replace the whole table: the session runs with DYNAMIC
        # partitionOverwriteMode (for S11), under which a partitioned
        # overwrite only replaces the partitions present in df — stale
        # partitions (e.g. forward-dated months removed by a fix) would
        # silently survive a full refresh. Pin static mode per-write.
        ctx.wh.write(
            df, m.schema, m.name, mode="overwrite",
            partition_by=list(m.partition_by),
            options={"partitionOverwriteMode": "static"},
        )
        return

    if m.materialization == "incremental_append":
        ctx.wh.write(df, m.schema, m.name, mode="append", partition_by=list(m.partition_by))
        return

    if m.materialization == "incremental_delete_insert":
        if m.partition_by:
            # dynamic partition overwrite: replaces only partitions present in df
            ctx.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            ctx.wh.write(
                df, m.schema, m.name, mode="overwrite", partition_by=list(m.partition_by)
            )
        else:
            # exact dbt delete+insert for arbitrary unique keys
            if not m.unique_key:
                raise ValueError(f"{m.name}: delete+insert needs unique_key or partition_by")
            target = ctx.this(m.name)
            keep = target.join(
                df.select(*m.unique_key).distinct(), list(m.unique_key), "left_anti"
            )
            out = keep.unionByName(df)
            # self-referential overwrite -> staged write + directory swap
            # (the anti-join reads the files being replaced)
            ctx.wh.write_staged(out, m.schema, m.name)
        return

    raise ValueError(f"unknown materialization {m.materialization}")
