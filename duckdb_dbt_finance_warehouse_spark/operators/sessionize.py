"""Event-stream batch operators: gap sessionization, tumbling windows,
JSON property extraction. All window/groupBy compositions — the batch
twins of the Structured Streaming versions in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessions: a session breaks when the time since the
    previous event exceeds the gap. session_seq = cumulative count of
    breaks; one shuffle on the user key.

    ``tiebreak_col`` makes ordering deterministic for equal timestamps;
    it is ignored when absent from ``df`` (pass an id column for frames
    with duplicate (user, ts) rows)."""
    order = [ts_col] + (
        [tiebreak_col] if tiebreak_col and tiebreak_col in df.columns else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        df.withColumn("is_new_session", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
        )
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    s = sessionize(df, user_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "duration_secs"
        ),
    )


def tumbling_window(
    df: DataFrame, ts_col: str = "ts", unit: str = "hour"
) -> DataFrame:
    """Tumbling event-time window aggregate (batch twin of streaming
    window(ts, '1 hour'))."""
    return df.groupBy(
        F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def resample_locf(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-series resample to a regular grid with gap-fill + LOCF
    (last observation carried forward) — the hypertable
    ``time_bucket_gapfill + locf`` op: per entity, one row per ``unit``
    bucket between its first and last event, carrying the latest
    observed value across empty buckets (``is_gap`` marks them).

    Two shuffles at any scale: (1) per-(entity, bucket) last value via
    ``max_by`` — map-side combined, deterministic tiebreak on
    (ts, tiebreak_col); (2) per-entity fold into a bucket->value map +
    grid explode (m1's single-shuffle zero-fill pattern) — the LOCF
    window then reuses the same hash partitioning, no third exchange.
    Grid size is calendar-bounded per entity, safe at any row count."""
    bucket = F.date_trunc(unit, F.col(ts_col))
    bv = (
        df.withColumn("_b", bucket)
        .groupBy(user_col, "_b")
        .agg(
            F.expr(
                f"max_by({value_col}, struct({ts_col}, {tiebreak_col}))"
            ).alias("_v")
        )
    )
    per_user = bv.groupBy(user_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_v"))).alias("_m"),
        F.min("_b").alias("_mn"),
        F.max("_b").alias("_mx"),
    )
    grid = per_user.select(
        user_col,
        "_m",
        F.explode(F.expr(f"sequence(_mn, _mx, interval 1 {unit})")).alias("bucket_ts"),
    )
    val = F.col("_m")[F.col("bucket_ts")]
    wff = (
        Window.partitionBy(user_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        F.col(user_col),
        "bucket_ts",
        F.last(val, ignorenulls=True).over(wff).alias("value_locf"),
        val.isNull().alias("is_gap"),
    )


def json_props(df: DataFrame, props_col: str = "props", key: str = "k") -> DataFrame:
    """Extract a JSON property as typed column (events.props is a JSON
    string; get_json_object is codegen'd, no UDF)."""
    return df.withColumn(
        f"prop_{key}", F.get_json_object(F.col(props_col), f"$.{key}").cast("int")
    )
