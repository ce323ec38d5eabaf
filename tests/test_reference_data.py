"""End-to-end run on the reference's own shipped CSV data (single batch,
500 accounts / 5,000 subscriptions — realistic mess: negative measures,
empty strings, capitalized booleans). Asserts the pipeline's invariants
and spot-checks business semantics at real scale.

(The reference repo is read-only input data here; all logic is this
repo's own.)"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from duckdb_dbt_finance_warehouse_spark.models import build_pipeline
from duckdb_dbt_finance_warehouse_spark.plans import testing as tst
from duckdb_dbt_finance_warehouse_spark.sources.csv import ingest_csv
from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

DATA = "/root/reference/data"
VARS = {"dim_date_start_date": "2023-01-01", "dim_date_end_date": "2025-12-31"}


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    w = Warehouse(spark, str(tmp_path_factory.mktemp("refwh")))
    ts = datetime(2025, 1, 15)
    for name in ["accounts", "subscriptions", "support_tickets", "feature_usage", "churn_events"]:
        ingest_csv(w, f"{DATA}/{name}.csv", name, mode="replace", batch_ts=ts)
    build_pipeline().run(spark, w, variables=VARS, full_refresh=True)
    return w


def test_raw_counts_and_types(spark, wh):
    assert wh.read("raw", "accounts").count() == 500
    assert wh.read("raw", "subscriptions").count() == 5000
    stg = wh.read("stg", "stg_subscriptions")
    row = stg.first()
    assert dict(stg.dtypes)["start_date"] == "date"
    assert dict(stg.dtypes)["is_trial"] == "boolean"
    assert row is not None


def test_dim_date_spine_bounds(spark, wh):
    dd = wh.read("mart", "dim_date")
    assert dd.count() == 1095  # 2023-01-01 .. 2025-12-30, end-exclusive
    assert dd.agg({"date_day": "max"}).first()[0] == date(2025, 12, 30)
    assert dd.filter("is_month_start").count() == 36


def test_invariants_at_reference_scale(spark, wh):
    fsm = wh.read("mart", "fct_subscription_month")
    fam = wh.read("mart", "fct_account_month")
    mart = wh.read("mart", "mart_mrr_waterfall_month")
    assert fsm.count() > 10_000  # ~5k subs x active months
    assert tst.unique_combination(fsm, ["subscription_id", "month_start_date"]).count() == 0
    assert tst.unique_combination(fam, ["account_id", "month_start_date"]).count() == 0
    assert tst.waterfall_ties_out(mart).count() == 0
    assert tst.account_ties_subscription(fam, fsm).count() == 0
    assert tst.eom_boundary(fsm).count() == 0


def test_generic_tests_at_reference_scale(spark, wh):
    """The full declared reference test matrix on the shipped CSVs."""
    failures = {
        name: viol.count()
        for name, viol in tst.declared_reference_tests(wh).items()
        if viol.count() > 0
    }
    assert failures == {}


def test_business_shape(spark, wh):
    mart = wh.read("mart", "mart_mrr_waterfall_month")
    rows = {r["month_start_date"]: r for r in mart.collect()}
    assert len(rows) == 36
    # the book grows over 2023-2024 signups: some month must show new MRR
    assert any(r["new_mrr"] > 0 for r in rows.values())
    assert any(r["churn_mrr"] > 0 for r in rows.values())
    # trials contribute rows but no MRR
    fsm = wh.read("mart", "fct_subscription_month")
    dim_sub = wh.read("mart", "dim_subscription")
    trial_ids = [r["subscription_id"] for r in dim_sub.filter("is_trial").limit(5).collect()]
    if trial_ids:
        s = fsm.filter(fsm.subscription_id.isin(trial_ids)).agg({"mrr_amount": "sum"}).first()[0]
        assert s == 0.0
    # sanitization: negative raw measures exist in the data and are nulled
    stg_s = wh.read("stg", "stg_subscriptions")
    n_neg = stg_s.filter("mrr_amount_raw < 0").count()
    assert stg_s.filter("mrr_amount < 0").count() == 0
    assert n_neg >= 0  # raw copies preserved either way
