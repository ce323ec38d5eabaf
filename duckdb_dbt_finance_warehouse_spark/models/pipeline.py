"""The finance pipeline DAG — every reference model registered with its
materialization + deps (reference DAG: SURVEY §1.5).

Snapshot models' fn returns the CURRENT rows to merge (the deduped
int_*_current view restricted to snapshot columns); the snapshot policy
performs the SCD2 check-strategy merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.registry import Context, Model, Pipeline
from . import dimensions, facts, intermediate, marts, staging

_SNAP_ACCOUNT_COLS = [
    "account_id",
    "account_name",
    "industry",
    "country",
    "signup_date",
    "referral_source",
    "signup_plan_tier",
    "signup_seats",
    "signup_is_trial",
    "churn_flag",
    "ingested_at",
    "source_file",
    "record_hash",
]

_SNAP_SUB_COLS = [
    "subscription_id",
    "account_id",
    "start_date",
    "end_date",
    "plan_tier",
    "seats",
    "mrr_amount_raw",
    "arr_amount_raw",
    "mrr_amount",
    "arr_amount",
    "is_trial",
    "upgrade_flag",
    "downgrade_flag",
    "churn_flag",
    "billing_frequency",
    "auto_renew_flag",
    "ingested_at",
    "source_file",
    "record_hash",
]


def snap_accounts(ctx: Context) -> DataFrame:
    return ctx.ref("int_accounts_current").select(*_SNAP_ACCOUNT_COLS)


def snap_subscriptions(ctx: Context) -> DataFrame:
    return ctx.ref("int_subscriptions_current").select(*_SNAP_SUB_COLS)


def build_pipeline() -> Pipeline:
    p = Pipeline()
    reg = p.register
    reg(Model("stg_accounts", "stg", staging.stg_accounts, (), "incremental_append"))
    reg(Model("stg_subscriptions", "stg", staging.stg_subscriptions, (), "incremental_append"))
    reg(Model("stg_support_tickets", "stg", staging.stg_support_tickets, (), "table"))
    reg(
        Model(
            "int_accounts_current",
            "int",
            intermediate.int_accounts_current,
            ("stg_accounts",),
            "view",
        )
    )
    reg(
        Model(
            "int_subscriptions_current",
            "int",
            intermediate.int_subscriptions_current,
            ("stg_subscriptions",),
            "view",
        )
    )
    reg(
        Model(
            "snap_accounts",
            "snapshots",
            snap_accounts,
            ("int_accounts_current",),
            "snapshot",
            unique_key=("account_id",),
        )
    )
    reg(
        Model(
            "snap_subscriptions",
            "snapshots",
            snap_subscriptions,
            ("int_subscriptions_current",),
            "snapshot",
            unique_key=("subscription_id",),
        )
    )
    reg(Model("dim_date", "mart", dimensions.dim_date, (), "table"))
    reg(Model("dim_account", "mart", dimensions.dim_account, ("snap_accounts",), "table"))
    reg(
        Model(
            "dim_subscription",
            "mart",
            dimensions.dim_subscription,
            ("snap_subscriptions", "dim_account"),
            "table",
        )
    )
    reg(
        Model(
            "fct_subscription_month",
            "mart",
            facts.fct_subscription_month,
            ("dim_date", "int_subscriptions_current", "dim_subscription", "dim_account"),
            "incremental_delete_insert",
            unique_key=("subscription_id", "month_start_date"),
            partition_by=("month_start_date",),
        )
    )
    reg(
        Model(
            "fct_account_month",
            "mart",
            facts.fct_account_month,
            ("dim_date", "fct_subscription_month", "dim_account"),
            "incremental_delete_insert",
            unique_key=("account_id", "month_start_date"),
            partition_by=("month_start_date",),
        )
    )
    reg(
        Model(
            "mart_mrr_waterfall_month",
            "mart",
            marts.mart_mrr_waterfall_month,
            ("dim_date", "fct_account_month"),
            "table",
        )
    )
    return p
