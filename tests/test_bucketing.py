"""Bucketed co-located joins — the 100 TB repeated-join strategy
(SURVEY §4): write both sides bucketed by the join key, and the join
plans with NO shuffle exchange on either side."""

from __future__ import annotations

import contextlib
import io

import pytest

from duckdb_dbt_finance_warehouse_spark.sources.tables import load_testdata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    import os

    wh = str(tmp_path_factory.mktemp("buckets"))
    t = load_testdata(spark, SF, "orders", "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # external bucketed tables (warehouse.dir is a static conf; an
    # explicit path keeps test artifacts in tmp)
    t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", os.path.join(wh, "b_orders")
    ).saveAsTable("b_orders")
    t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", os.path.join(wh, "b_lineitem")
    ).saveAsTable("b_lineitem")
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compact_table_unpartitioned_and_partitioned(spark, tmp_path):
    """Small-file compaction: file count drops to the target, content is
    identical, partition layout survives, and sorted layout produces
    row-group stats usable for skipping."""
    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.sources.maintenance import (
        compact_table,
        data_files,
    )
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket_key"),
        (F.col("id") * 2).alias("val"),
    )
    # fragmented write: many small files
    wh.write(df.repartition(32), "mart", "flat")
    assert len(data_files(wh, "mart", "flat")) >= 32
    before = sorted(tuple(r) for r in wh.read("mart", "flat").collect())
    n = compact_table(wh, "mart", "flat", target_files=2, sort_within=["id"])
    assert n <= 2
    assert sorted(tuple(r) for r in wh.read("mart", "flat").collect()) == before

    wh.write(df.repartition(16), "mart", "parts", partition_by=["bucket_key"])
    frag = len(data_files(wh, "mart", "parts"))
    assert frag >= 16
    before_p = sorted(tuple(r) for r in wh.read("mart", "parts").collect())
    n = compact_table(wh, "mart", "parts", target_files=1)
    assert n == 4  # one file per partition value
    after_p = wh.read("mart", "parts")
    assert sorted(tuple(r) for r in after_p.collect()) == before_p
    # partition pruning still works on the compacted layout
    assert after_p.filter("bucket_key = '1'").count() == 2500
