"""Intermediate "current truth" views — latest arrival per natural key
(reference: models/intermediate/int_*_current.sql, W1).

One window shuffle on the natural key. At scale the arrival log grows
unbounded; the dedup reads only (key, ingested_at, payload) and Spark's
WindowGroupLimit prunes to the per-key top row before the final sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.registry import Context


def _latest_per_key(df: DataFrame, key: str) -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.desc("ingested_at"), F.desc("source_file"))
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def int_accounts_current(ctx: Context) -> DataFrame:
    return _latest_per_key(ctx.ref("stg_accounts"), "account_id")


def int_subscriptions_current(ctx: Context) -> DataFrame:
    return _latest_per_key(ctx.ref("stg_subscriptions"), "subscription_id")
