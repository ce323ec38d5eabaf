"""Data-quality test kit — dbt's generic + singular tests as DataFrame
checks (SURVEY §2.10 D5-D7, §5).

Every check returns a DataFrame of VIOLATING rows (dbt convention:
pass == 0 rows), so callers can assert `.count() == 0` or inspect
failures. All checks are single-pass aggregations/joins — no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNull())


def unique(df: DataFrame, col: str) -> DataFrame:
    return df.groupBy(col).count().filter(F.col("count") > 1)


def accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    """NULLs pass (dbt semantics); only non-null out-of-domain rows fail."""
    return df.filter(F.col(col).isNotNull() & ~F.col(col).isin(values))


def relationships(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """FK integrity: child keys with no parent (anti join; NULL FKs pass)."""
    return (
        child.filter(F.col(child_col).isNotNull())
        .select(child_col)
        .join(parent.select(F.col(parent_col).alias(child_col)), child_col, "left_anti")
    )


def unique_combination(df: DataFrame, cols: list[str]) -> DataFrame:
    """dbt_utils.unique_combination_of_columns: composite grain must be unique."""
    return df.groupBy(*cols).count().filter(F.col("count") > 1)


# --- singular invariants (reference tests/, pass == empty) -----------------


def waterfall_ties_out(mart: DataFrame, tol: float = 1e-4) -> DataFrame:
    """begin + new + reactivation + expansion - contraction - churn == end
    within tolerance (reference: tests/test_waterfall_ties_out.sql)."""
    recon = (
        F.col("begin_mrr")
        + F.col("new_mrr")
        + F.col("reactivation_mrr")
        + F.col("expansion_mrr")
        - F.col("contraction_mrr")
        - F.col("churn_mrr")
    )
    return mart.withColumn("recon_diff", F.abs(recon - F.col("end_mrr"))).filter(
        F.col("recon_diff") > tol
    )


def account_ties_subscription(
    fct_account_month: DataFrame, fct_subscription_month: DataFrame, tol: float = 1e-4
) -> DataFrame:
    """account-month end MRR == sum of subscription-month MRR
    (reference: tests/test_account_month_ties_subscription_month.sql)."""
    sub = fct_subscription_month.groupBy("account_id", "month_start_date").agg(
        F.sum(F.coalesce("mrr_amount", F.lit(0.0))).alias("sub_mrr")
    )
    return (
        fct_account_month.join(sub, ["account_id", "month_start_date"], "left")
        .withColumn(
            "diff", F.abs(F.col("mrr_end_mrr") - F.coalesce(F.col("sub_mrr"), F.lit(0.0)))
        )
        .filter(F.col("diff") > tol)
    )


def eom_boundary(fct_subscription_month: DataFrame) -> DataFrame:
    """a subscription ending before the month's last day must contribute 0
    MRR that month (reference: tests/test_eom_end_date_boundary.sql)."""
    return fct_subscription_month.filter(
        F.col("subscription_end_date").isNotNull()
        & (F.col("subscription_end_date") < F.last_day(F.col("month_start_date")))
        & (F.trunc("subscription_end_date", "month") == F.col("month_start_date"))
        & (F.col("mrr_amount") > 0)
    )
