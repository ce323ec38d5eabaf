"""Ad-hoc SQL consumption — the BI entry point (SURVEY §3.3).

The reference's product surface is "query the warehouse file with SQL"
(DuckDB CLI / DBeaver over warehouse.duckdb). The Spark equivalent:
register every materialized table in the session catalog and hand the
user ``spark.sql``. Views use the ``<schema>_<table>`` convention
(``mart_fct_account_month``) plus bare-name aliases where unambiguous.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import Warehouse, load_testdata


def register_warehouse(wh: Warehouse) -> list[str]:
    """Register every table in the warehouse as temp views; returns the
    registered names."""
    names: list[str] = []
    if not os.path.isdir(wh.root):
        return names
    for schema in sorted(os.listdir(wh.root)):
        sdir = os.path.join(wh.root, schema)
        if not os.path.isdir(sdir):
            continue
        for table in sorted(os.listdir(sdir)):
            if not wh.exists(schema, table):
                continue
            df = wh.read(schema, table)
            qualified = f"{schema}_{table}"
            df.createOrReplaceTempView(qualified)
            names.append(qualified)
            # bare alias (dbt-style ref name) when it cannot collide
            if table not in names:
                df.createOrReplaceTempView(table)
                names.append(table)
    return names


def register_testdata(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the driver corpus tables under their bare names."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return sorted(dfs)
