"""Monthly-grain facts (reference: models/reporting/facts/*.sql).

Key Spark-first choices:

- The subscription->active-months expansion (J1) is
  ``explode(sequence(start_month, end_month, 1 month))`` — linear
  generator, no nested-loop BETWEEN join; clamped to the processed month
  window so incremental runs only generate restated months.
- SCD2 dimension attachment (J3/J4) is an equi+interval join against the
  month-truncated validity windows, with the earliest version backdated
  to 1900-01-01 so pre-observation facts still resolve.
- Incremental runs recompute a rolling ``reprocess_months`` window and
  land via dynamic partition overwrite on ``month_start_date``.
- Deviations from the reference (deliberate, documented):
  A1 — reads the deduped ``int_subscriptions_current`` view, not the
  append-only ``stg_subscriptions`` arrival log (the reference fans out
  duplicates with >1 batch: fct_subscription_month.sql:41).
  A2 — ``fct_account_month`` computes its windows (lag / has_paid_before)
  over FULL history and only then restricts to the restatement window;
  the reference truncates first and misclassifies the window's left edge
  (fct_account_month.sql:14-23 feeding :37-47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import exact_sum
from ..plans.registry import Context


def _month_cutoff(ctx: Context, model_name: str) -> object | None:
    """Incremental restatement cutoff: trunc(month, max(target month) -
    reprocess_months). One-row driver collect, then a pushed-down filter."""
    if not ctx.is_incremental(model_name):
        return None
    reprocess = int(ctx.var("reprocess_months", 2))
    row = (
        ctx.this(model_name)
        .agg(F.trunc(F.add_months(F.max("month_start_date"), -reprocess), "month").alias("c"))
        .first()
    )
    return row["c"] if row else None


def _scd2_month_dim(
    dim: DataFrame, natural_key: str, key_col: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Month-truncated SCD2 validity + first-version backdating per
    entity (reference: fct_subscription_month.sql:102-121).

    DOCUMENTED DEVIATION (the A2 rule — the reference contradicts its
    own declared grain-unique test here): the reference backdates EVERY
    version whose valid_from month equals the entity's first month, so
    two versions opening inside the first month BOTH cover all history
    months and duplicate the fact grain. Backdating only the EARLIEST
    version (row_number 1 by true valid_from) keeps pre-history months
    on exactly one version and is identical whenever the first month
    holds a single version — the only case the reference's own fixtures
    exercise. ``extra_cols`` ride along so callers don't re-read and
    re-join the dimension just to fetch another attribute."""
    d = dim.select(
        natural_key,
        key_col,
        *extra_cols,
        F.col("valid_from").alias("_vf"),
        F.trunc("valid_from", "month").alias("valid_from_month"),
        F.when(
            F.col("valid_to").isNull(), F.lit(None).cast("date")
        ).otherwise(F.trunc("valid_to", "month")).alias("valid_to_month"),
    )
    w = Window.partitionBy(natural_key).orderBy("_vf", key_col)
    d = d.withColumn("_rn", F.row_number().over(w))
    return d.withColumn(
        "effective_valid_from_month",
        F.when(F.col("_rn") == 1, F.lit("1900-01-01").cast("date")).otherwise(
            F.col("valid_from_month")
        ),
    ).drop("_vf", "_rn")


def fct_subscription_month(ctx: Context) -> DataFrame:
    dd = ctx.ref("dim_date")
    months = (
        dd.filter(F.col("is_month_start"))
        .select("month_start_date", "next_month_start_date")
        .distinct()
    )
    cutoff = _month_cutoff(ctx, "fct_subscription_month")
    if cutoff is not None:
        months = months.filter(F.col("month_start_date") >= F.lit(cutoff))

    bounds = months.agg(
        F.min("month_start_date").alias("min_month"),
        F.max("month_start_date").alias("max_month"),
    )

    subs = ctx.ref("int_subscriptions_current").select(
        "subscription_id", "account_id", "start_date", "end_date", "is_trial", "mrr_amount"
    )

    # month expansion: clamp [start_month, end_month] to the processed
    # window, then explode a month sequence (no BETWEEN nested-loop join)
    bounded = (
        subs.crossJoin(F.broadcast(bounds))
        .withColumn("start_month", F.trunc("start_date", "month"))
        .withColumn(
            "end_month",
            F.least(
                F.trunc(F.coalesce("end_date", "max_month"), "month"), F.col("max_month")
            ),
        )
        .withColumn("gen_start", F.greatest("start_month", "min_month"))
        .filter(F.col("gen_start") <= F.col("end_month"))
    )
    spine = bounded.select(
        "subscription_id",
        "account_id",
        "start_date",
        "end_date",
        "is_trial",
        "mrr_amount",
        F.explode(
            F.expr("sequence(gen_start, end_month, interval 1 month)")
        ).alias("month_start_date"),
    ).withColumn("next_month_start_date", F.add_months("month_start_date", 1))

    eom = F.date_sub(F.col("next_month_start_date"), 1)
    is_active_at_eom = (F.col("start_date") < F.col("next_month_start_date")) & (
        F.col("end_date").isNull() | (F.col("end_date") >= eom)
    )
    base = spine.select(
        "month_start_date",
        "subscription_id",
        "account_id",
        F.col("start_date").alias("subscription_start_date"),
        F.col("end_date").alias("subscription_end_date"),
        is_active_at_eom.alias("is_active_at_eom"),
        (F.trunc("start_date", "month") == F.col("month_start_date")).alias("is_start_month"),
        (
            F.col("end_date").isNotNull()
            & (F.trunc("end_date", "month") == F.col("month_start_date"))
        ).alias("is_end_month"),
        F.when(
            is_active_at_eom & ~F.coalesce(F.col("is_trial"), F.lit(False)),
            F.coalesce("mrr_amount", F.lit(0.0)),
        )
        .otherwise(0.0)
        .alias("mrr_amount"),
    )

    # account_key rides through the dim pass (extra_cols) — the old
    # form re-read dim_subscription and self-joined it on
    # subscription_key just to fetch one column
    sub_dim = _scd2_month_dim(
        ctx.ref("dim_subscription"), "subscription_id", "subscription_key",
        extra_cols=("account_key",),
    ).withColumnRenamed("account_key", "subscription_account_key")
    acct_dim = _scd2_month_dim(ctx.ref("dim_account"), "account_id", "account_key")

    f = base.alias("f")
    sd = F.broadcast(sub_dim.alias("sd"))
    with_sub = f.join(
        sd,
        (F.col("sd.subscription_id") == F.col("f.subscription_id"))
        & (F.col("f.month_start_date") >= F.col("sd.effective_valid_from_month"))
        & (
            F.col("sd.valid_to_month").isNull()
            | (F.col("f.month_start_date") < F.col("sd.valid_to_month"))
        ),
        "left",
    ).select("f.*", "sd.subscription_key", "sd.subscription_account_key")

    w = with_sub.alias("w")
    ad = F.broadcast(acct_dim.alias("ad"))
    final = w.join(
        ad,
        (F.col("ad.account_id") == F.col("w.account_id"))
        & (F.col("w.month_start_date") >= F.col("ad.effective_valid_from_month"))
        & (
            F.col("ad.valid_to_month").isNull()
            | (F.col("w.month_start_date") < F.col("ad.valid_to_month"))
        ),
        "left",
    ).select(
        F.col("w.subscription_key"),
        F.coalesce("w.subscription_account_key", "ad.account_key").alias("account_key"),
        F.col("w.subscription_id"),
        F.col("w.account_id"),
        F.col("w.month_start_date"),
        F.col("w.mrr_amount"),
        F.col("w.is_active_at_eom"),
        F.col("w.is_start_month"),
        F.col("w.is_end_month"),
        F.col("w.subscription_start_date"),
        F.col("w.subscription_end_date"),
    )
    return final


def fct_account_month(ctx: Context) -> DataFrame:
    dd = ctx.ref("dim_date")
    months = dd.filter(F.col("is_month_start")).select("month_start_date").distinct()
    fsm = ctx.ref("fct_subscription_month")

    # A2 fix: spine + windows over FULL history; restrict at the end
    bounds = fsm.groupBy("account_id").agg(
        F.min("month_start_date").alias("first_month"),
        F.max("month_start_date").alias("last_month"),
    )
    spine = (
        bounds.select(
            "account_id",
            F.explode(
                F.expr(
                    "sequence(first_month, add_months(last_month, 1), interval 1 month)"
                )
            ).alias("month_start_date"),
        )
        # respect dim_date coverage, as the reference's JOIN months does
        .join(F.broadcast(months), "month_start_date", "left_semi")
    )

    monthly = fsm.groupBy("account_id", "month_start_date").agg(
        exact_sum(F.coalesce("mrr_amount", F.lit(0.0))).alias("mrr_end_mrr")
    )
    spined = spine.join(monthly, ["account_id", "month_start_date"], "left").select(
        "account_id",
        "month_start_date",
        F.coalesce("mrr_end_mrr", F.lit(0.0)).alias("mrr_end_mrr"),
    )

    w_ord = Window.partitionBy("account_id").orderBy("month_start_date")
    with_flags = (
        spined.withColumn(
            "mrr_begin_mrr", F.coalesce(F.lag("mrr_end_mrr").over(w_ord), F.lit(0.0))
        )
        .withColumn("mrr_delta", F.col("mrr_end_mrr") - F.col("mrr_begin_mrr"))
        .withColumn(
            "has_paid_before",
            F.coalesce(
                F.max(F.when(F.col("mrr_end_mrr") > 0, 1).otherwise(0)).over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            == 1,
        )
    )

    begin, end, delta = F.col("mrr_begin_mrr"), F.col("mrr_end_mrr"), F.col("mrr_delta")
    classified = with_flags.withColumn(
        "movement_type",
        F.when((begin == 0) & (end > 0) & ~F.col("has_paid_before"), "new")
        .when((begin == 0) & (end > 0) & F.col("has_paid_before"), "reactivation")
        .when((begin > 0) & (end == 0), "churn")
        .when((begin > 0) & (end > 0) & (delta > 0), "upgrade")
        .when((begin > 0) & (end > 0) & (delta < 0), "downgrade")
        .when((begin == 0) & (end == 0), "zero")
        .otherwise("no_change"),
    )

    acct_dim = _scd2_month_dim(ctx.ref("dim_account"), "account_id", "account_key")
    c = classified.alias("c")
    ad = F.broadcast(acct_dim.alias("ad"))
    final = c.join(
        ad,
        (F.col("ad.account_id") == F.col("c.account_id"))
        & (F.col("c.month_start_date") >= F.col("ad.effective_valid_from_month"))
        & (
            F.col("ad.valid_to_month").isNull()
            | (F.col("c.month_start_date") < F.col("ad.valid_to_month"))
        ),
        "left",
    ).select(
        F.col("ad.account_key"),
        F.col("c.account_id"),
        F.col("c.month_start_date"),
        F.col("c.mrr_begin_mrr"),
        F.col("c.mrr_end_mrr"),
        F.col("c.mrr_delta"),
        F.col("c.movement_type"),
        F.when(F.col("c.movement_type") == "new", end).otherwise(0.0).alias("new_mrr"),
        F.when(F.col("c.movement_type") == "reactivation", end)
        .otherwise(0.0)
        .alias("reactivation_mrr"),
        F.when(F.col("c.movement_type") == "upgrade", delta).otherwise(0.0).alias("upgrade_mrr"),
        F.when(F.col("c.movement_type") == "downgrade", F.abs(delta))
        .otherwise(0.0)
        .alias("downgrade_mrr"),
        F.when(F.col("c.movement_type") == "churn", begin).otherwise(0.0).alias("churn_mrr"),
    )

    cutoff = _month_cutoff(ctx, "fct_account_month")
    if cutoff is not None:
        final = final.filter(F.col("month_start_date") >= F.lit(cutoff))
    return final
