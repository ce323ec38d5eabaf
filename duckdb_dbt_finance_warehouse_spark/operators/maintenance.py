"""Table maintenance — the compaction pass every long-lived warehouse
needs: incremental appends (S10) and per-partition restatements (S11)
accrete small files/partitions, and read amplification grows until
someone coalesces them (DuckDB-side the reference gets this for free
from single-file tables; engines call it OPTIMIZE / rewrite_data_files).

Two pieces:

- ``compaction_plan`` — the DECLARATIVE half: group adjacent (by sort
  order) partitions into target-row compaction groups with one prefix
  sum over the per-partition row counts. The window is over PARTITION
  SUMMARIES (dozens-to-thousands of rows at any corpus size, same
  bounded-state argument as the quantile-sketch cells), never over the
  data, so the plan costs one grouped count of the table plus an
  O(#partitions) window.
- ``Warehouse.compact`` (sources/tables.py) — the EXECUTING half:
  rewrite a table into ceil(rows/target) evenly-sized files via the
  crash-safe staged swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    df: DataFrame, part_col, target_rows: int, part_name: str | None = None
) -> DataFrame:
    """Per-partition compaction assignment: (partition, n_rows,
    compaction_group) where group = floor(cum_start / target_rows) over
    partitions in ``part_col`` sort order — adjacent small partitions
    share a group (one rewrite task), a partition bigger than the
    target keeps a group to itself. Deterministic, exact integer
    arithmetic throughout.

    ``part_col`` may be a column name or an expression; pass
    ``part_name`` to label an expression."""
    c = F.col(part_col) if isinstance(part_col, str) else part_col
    name = part_name or (part_col if isinstance(part_col, str) else "partition")
    if target_rows <= 0:
        raise ValueError(
            f"compaction_plan: target_rows must be positive, got {target_rows}"
        )
    per = df.groupBy(c.alias(name)).agg(F.count("*").alias("n_rows"))
    w = Window.orderBy(name).rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("_cum_end", F.sum("n_rows").over(w))
        .select(
            name,
            "n_rows",
            F.expr(f"(_cum_end - n_rows) div {target_rows}").alias(
                "compaction_group"
            ),
        )
    )
