"""Table maintenance: small-file compaction and sorted layout.

Incremental pipelines accrete small files (every micro-batch append
writes its own); at 100 TB scan cost becomes dominated by file-open
overhead and tiny row groups. ``compact_table`` rewrites a warehouse
table to a target file count via the staged-swap path (crash-safe, the
old layout stays durable until the new one is complete — same guarantee
as the SCD2 snapshot write).

``sort_within`` additionally clusters rows inside each output file so
parquet row-group min/max statistics become selective — Spark's scan
then skips row groups for predicates on the sort keys (poor-man's
Z-order for the single-key case; for true multi-dimensional clustering
interleave key bits driver-side and sort by that).
"""

from __future__ import annotations

import os

from .tables import Warehouse


def data_files(wh: Warehouse, schema: str, table: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(wh.path(schema, table)):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
    return out


def compact_table(
    wh: Warehouse,
    schema: str,
    table: str,
    target_files: int = 1,
    sort_within: list[str] | None = None,
    drop_partitions: list[str] | None = None,
) -> int:
    """Rewrite ``schema.table`` with ``target_files`` files per
    partition (partitioning layout is preserved), optionally sorting
    rows within each output file by ``sort_within`` for row-group
    pruning. Returns the new data-file count. Metadata-only readers are
    unaffected: the path and schema do not change.

    ``drop_partitions`` folds away BOOKKEEPING partition columns that
    accreted during appends — the ``_epoch`` partition the streaming
    appenders (``streaming.pipeline.stream_ann_index_append``,
    ``stream_append_to_warehouse``) add for exactly-once replay:
    compacting with drop_partitions=["_epoch"] collapses every epoch
    into the remaining layout (e.g. centroid_id stays the pruning key).
    Epoch idempotence is only needed until the stream checkpoint makes
    an epoch durable; after compaction a restart starts FRESH epochs
    against the compacted base, so the replay guarantee is preserved."""
    df = wh.read(schema, table)
    # Partition columns = reader-inferred columns absent from the data
    # files themselves (Spark appends them, in nesting order, after the
    # file columns), INTERSECTED with the hive-style ``col=`` directory
    # segments actually present under the table root.  The schema check
    # alone sampled one file — on a schema-evolved table read with
    # merged schemas, a data column missing from that one file would be
    # misclassified as a partition column and the rewrite would silently
    # change the table layout (r8 ADVICE); a directory segment cannot
    # lie about being a partition level.
    files = data_files(wh, schema, table)
    part_cols: list[str] = []
    if files:
        root = wh.path(schema, table)
        hive_levels: set[str] = set()
        for f in files:
            for seg in os.path.relpath(os.path.dirname(f), root).split(os.sep):
                if "=" in seg:
                    hive_levels.add(seg.split("=", 1)[0])
        file_cols = set(df.sparkSession.read.parquet(files[0]).columns)
        part_cols = [
            c for c in df.columns if c not in file_cols and c in hive_levels
        ]
    if drop_partitions:
        missing = [c for c in drop_partitions if c not in part_cols]
        if missing:
            raise ValueError(
                f"drop_partitions {missing} are not partition columns of "
                f"{schema}.{table} (found: {part_cols})"
            )
        df = df.drop(*drop_partitions)
        part_cols = [c for c in part_cols if c not in drop_partitions]
    if part_cols:
        # one shuffle keyed by partition value (+ a deterministic row
        # salt when >1 file per partition is wanted)
        from pyspark.sql import functions as F

        keys = [F.col(c) for c in part_cols]
        if target_files > 1:
            keys.append(
                F.crc32(
                    F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns])
                )
                % target_files
            )
        df = df.repartition(*keys)
    else:
        df = df.repartition(target_files)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    wh.write_staged(df, schema, table, partition_by=part_cols or None)
    return len(data_files(wh, schema, table))
