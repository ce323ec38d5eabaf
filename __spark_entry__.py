"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator suite from
``duckdb_dbt_finance_warehouse_spark.suite`` — one entry per implemented
operator from SURVEY.md §2 (+ the §7.6 extension surface), each paired
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_dbt_finance_warehouse_spark.suite import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: monthly revenue rollup on sf0.001 — orders x lineitem,
    month-grain conditional sums (the reference's waterfall shape on the
    driver's TPC-H-ish corpus)."""
    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.functions.money import exact_sum
    from duckdb_dbt_finance_warehouse_spark.sources.tables import load_testdata

    t = load_testdata(spark, "/root/testdata/sf0.001", "orders", "lineitem")
    li, o = t["lineitem"], t["orders"]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.trunc("o_orderdate", "month").alias("month_start_date"))
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("month_start_date")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.resolved_oracle()
        for name, spec in REGISTRY.items()
        if spec.has_oracle
    }
