"""Regression pins for the r10 model/plan-layer review findings: edge
semantics the scenario fixtures never exercised — NULL natural keys,
full-refresh under dynamic partition-overwrite, multi-version first
months, nullable diff hashes, and the reference-exact EOM invariant."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from duckdb_dbt_finance_warehouse_spark.plans.snapshot import scd2_merge, snapshot_diff
from duckdb_dbt_finance_warehouse_spark.plans.testing import eom_boundary

TS = "ts_a string, record_hash string"


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "k string, record_hash string, ingested_at timestamp"
    )


def test_scd2_merge_raises_on_null_key(spark):
    """A NULL natural key matches nothing in the full-outer merge, so it
    used to be silently DROPPED from the merged state (incoming) or
    silently lost (stored) — the merge must refuse loudly instead."""
    t = datetime.datetime(2024, 1, 1)
    good = _rows(spark, [("a", "h1", t)])
    bad = _rows(spark, [(None, "h2", t)])
    with pytest.raises(ValueError, match="NULL k"):
        scd2_merge(None, bad, unique_key="k")
    state = scd2_merge(None, good, unique_key="k")
    with pytest.raises(ValueError, match="NULL k"):
        scd2_merge(state, good.unionByName(bad), unique_key="k")


def test_snapshot_diff_classifies_nullable_hashes(spark):
    """Presence must come from side flags, not hash NULLness: a key in
    BOTH states with a NULL hash on one side is 'changed' (null-safe
    compare), never 'added'/'removed', and NULL-vs-NULL is unchanged."""
    old = spark.createDataFrame(
        [("both_null", None), ("old_null", None), ("gone", "h"), ("same", "h")],
        "k string, record_hash string",
    )
    new = spark.createDataFrame(
        [("both_null", None), ("old_null", "h2"), ("fresh", "h"), ("same", "h")],
        "k string, record_hash string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {"old_null": "changed", "gone": "removed", "fresh": "added"}


def test_full_refresh_replaces_stale_partitions(spark, tmp_path_factory):
    """The session runs with DYNAMIC partitionOverwriteMode (for the
    incremental restatement policy), under which a partitioned full
    rebuild used to leave partitions absent from the recomputed frame
    alive on disk. The table/full-refresh path must pin static mode."""
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    df2 = spark.createDataFrame([("2024-01-01", 1), ("2024-02-01", 2)], "m string, v int")
    wh.write(df2, "marts", "t", mode="overwrite", partition_by=["m"])
    df1 = spark.createDataFrame([("2024-01-01", 9)], "m string, v int")
    wh.write(
        df1, "marts", "t", mode="overwrite", partition_by=["m"],
        options={"partitionOverwriteMode": "static"},
    )
    got = wh.read("marts", "t").collect()
    assert len(got) == 1 and got[0]["v"] == 9  # the Feb partition is GONE


def test_scd2_month_dim_backdates_only_earliest_version(spark):
    """Two versions opening inside the entity's FIRST month: only the
    earliest may cover pre-history months (the reference backdates both
    — its own grain-unique test fails on that input; documented A2
    deviation)."""
    from duckdb_dbt_finance_warehouse_spark.models.facts import _scd2_month_dim

    dim = spark.createDataFrame(
        [
            ("s1", "k1", datetime.datetime(2024, 3, 5), datetime.datetime(2024, 3, 20)),
            ("s1", "k2", datetime.datetime(2024, 3, 20), None),
        ],
        "subscription_id string, subscription_key string, "
        "valid_from timestamp, valid_to timestamp",
    )
    d = {
        r["subscription_key"]: r["effective_valid_from_month"]
        for r in _scd2_month_dim(dim, "subscription_id", "subscription_key").collect()
    }
    assert d["k1"] == datetime.date(1900, 1, 1)
    assert d["k2"] == datetime.date(2024, 3, 1)
    # a pre-history month (Jan) now matches exactly ONE version
    jan = datetime.date(2024, 1, 1)
    rows = _scd2_month_dim(dim, "subscription_id", "subscription_key").filter(
        (F.lit(jan) >= F.col("effective_valid_from_month"))
        & (
            F.col("valid_to_month").isNull()
            | (F.lit(jan) < F.col("valid_to_month"))
        )
    ).collect()
    assert len(rows) == 1 and rows[0]["subscription_key"] == "k1"


def test_eom_boundary_flags_post_end_months(spark):
    """The reference invariant flags ANY month row where the sub ended
    before that month's last day and MRR != 0 — including months
    entirely AFTER the end date (the old port's trunc conjunct silently
    passed those) and NULL-as-0 / negative MRR via coalesce + <> 0."""
    rows = spark.createDataFrame(
        [
            # ended Jan 15, nonzero in FEBRUARY -> must be flagged
            ("s1", datetime.date(2024, 2, 1), datetime.date(2024, 1, 15), 10.0),
            # ended Jan 15, zero in February -> fine
            ("s2", datetime.date(2024, 2, 1), datetime.date(2024, 1, 15), 0.0),
            # ends on month's last day -> active through EOM, fine
            ("s3", datetime.date(2024, 1, 1), datetime.date(2024, 1, 31), 10.0),
            # negative residual also counts as nonzero
            ("s4", datetime.date(2024, 2, 1), datetime.date(2024, 1, 15), -1.0),
        ],
        "subscription_id string, month_start_date date, "
        "subscription_end_date date, mrr_amount double",
    )
    got = {r["subscription_id"] for r in eom_boundary(rows).collect()}
    assert got == {"s1", "s4"}
