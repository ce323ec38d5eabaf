"""AQE skew-join handling — the runtime complement to the manual
salting operators (operators/skew): on a cluster the first line of
defense for a hot key is `spark.sql.adaptive.skewJoin` splitting the
oversized partition at shuffle-read time, no code change. This test
pins that the demonstrated mechanism actually engages (the executed
plan marks the join `isSkew=true`) and that results are unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    """90% of the left side shares one key: with thresholds scaled to
    test data, AQE must mark the sort-merge join skew-handled and the
    result must match the broadcast-free exact join."""
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    joined = left.join(right, "k")
    # run THIS DataFrame's query execution (count()/write() plan a
    # separate execution whose AQE state is invisible from `joined`)
    got = len(joined.collect())
    # expected: hot key 7 matches once (right is unique per k) so every
    # left row with k in right survives exactly once
    want = left.filter(F.col("k") < 1_000).count()
    assert got == want
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, final[:2000]
