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

from .dedup import _persist


def compaction_plan(
    df: DataFrame,
    part_col,
    target_rows: int,
    part_name: str | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Per-partition compaction assignment: (partition, n_rows,
    compaction_group) where group = floor(cum_start / target_rows) over
    partitions in ``part_col`` sort order — adjacent small partitions
    share a group (one rewrite task), a partition bigger than the
    target keeps a group to itself. Deterministic, exact integer
    arithmetic throughout.

    The prefix sum is the TWO-PASS distributed form, never a global
    window (a table at 100 TB can carry 10^5-10^6 partitions; a
    ``Window.orderBy`` with no partition key moves every summary row
    through one task and Spark warns about it):

    1. range-partition the summaries into ``buckets`` ordered buckets
       (``repartitionByRange`` keeps bucket i's keys <= bucket i+1's),
    2. a bucket-partitioned window computes the LOCAL cumulative sum,
    3. the per-bucket totals collapse to ONE row (``collect_list``)
       and an O(buckets^2) higher-order expression turns them into
       exclusive bucket offsets — no window, no nested-loop join,
    4. a broadcast join adds each bucket's offset back.

    AQE may coalesce the range exchange; coalescing merges only
    ADJACENT range partitions, so buckets stay range-contiguous and
    the local-cumsum + offset decomposition stays exact.

    ``part_col`` may be a column name or an expression; pass
    ``part_name`` to label an expression."""
    c = F.col(part_col) if isinstance(part_col, str) else part_col
    name = part_name or (part_col if isinstance(part_col, str) else "partition")
    if target_rows <= 0:
        raise ValueError(
            f"compaction_plan: target_rows must be positive, got {target_rows}"
        )
    per = df.groupBy(c.alias(name)).agg(F.count("*").alias("n_rows"))
    bucketed = per.repartitionByRange(buckets, F.col(name)).withColumn(
        "_bucket", F.spark_partition_id()
    )
    # consumed by the local-cumsum window AND the totals aggregate AND
    # the final join: persist the (tiny, bounded-cardinality) summaries
    # so the grouped count over the table + range exchange run once;
    # registered for release_persisted() like the minhash caches
    bucketed = _persist(bucketed)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(name)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_local_cum", F.sum("n_rows").over(w))
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.sum("n_rows").alias("_total"))
        .agg(F.sort_array(F.collect_list(F.struct("_bucket", "_total"))).alias("_ts"))
        .select(
            F.explode(
                F.expr(
                    "transform(_ts, (t, i) -> struct("
                    "t._bucket AS _bucket, "
                    "aggregate(slice(_ts, 1, i), 0L, (acc, x) -> acc + x._total)"
                    " AS _offset))"
                )
            ).alias("_o")
        )
        .select("_o._bucket", "_o._offset")
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .select(
            name,
            "n_rows",
            F.expr(f"(_local_cum + _offset - n_rows) div {target_rows}").alias(
                "compaction_group"
            ),
        )
    )
