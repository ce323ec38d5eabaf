"""Adversarial cross-engine tests for the exact money aggregation —
the values most likely to expose rounding/ordering divergence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_dbt_finance_warehouse_spark.functions.money import exact_sum

ADVERSARIAL = [
    0.1, 0.2, 0.3,            # classic binary-unrepresentable
    1e12 + 0.0001, -1e12,     # magnitude spread (catastrophic cancellation)
    12345.67895,              # exact .5 at 4dp in decimal terms
    -12345.67895,             # negative half-tie
    0.00005, -0.00005,        # half-ties at the scale boundary
    833.0, 2786.0,            # reference-like integers-as-doubles
    99999999.9999,
]


@pytest.mark.parametrize("scale", [4, 6])
def test_exact_sum_matches_duckdb_on_adversarial_values(spark, scale):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], ["x"])
    got = df.agg(exact_sum("x", scale=scale).alias("s")).first()["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in ADVERSARIAL])
    want = con.execute(
        f"SELECT SUM(CAST(floor(x * {10**scale} + 0.5) AS BIGINT)) / {float(10**scale)} FROM t"
    ).fetchone()[0]
    assert repr(got) == repr(want)


def test_exact_sum_is_partitioning_invariant(spark):
    vals = [(v,) for v in ADVERSARIAL * 50]
    one = spark.createDataFrame(vals, ["x"]).coalesce(1)
    many = spark.createDataFrame(vals, ["x"]).repartition(32)
    a = one.agg(exact_sum("x").alias("s")).first()["s"]
    b = many.agg(exact_sum("x").alias("s")).first()["s"]
    assert repr(a) == repr(b)


def test_wide_path_agrees_with_fast_path_in_envelope(spark):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], ["x"])
    fast = df.agg(exact_sum("x", scale=4).alias("s")).first()["s"]
    wide = df.agg(exact_sum("x", scale=4, wide=True).alias("s")).first()["s"]
    # each deliberate half-tie value may differ by one unit of the scale
    # between HALF_UP (decimal) and floor(+0.5); everything else agrees
    assert abs(fast - wide) <= 5e-4
