"""End-to-end test of `runner.py curate`: the composed corpus pipeline
(audit -> leakage-safe split -> packed training pieces) lands in the
warehouse with consistent counts and conserved tokens."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_curate_cli_end_to_end(spark, tmp_path):
    import runner
    from duckdb_dbt_finance_warehouse_spark.operators import text
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh_dir = str(tmp_path / "wh")
    args = argparse.Namespace(
        warehouse=wh_dir,
        docs_dir=SF,
        val_fraction=0.2,
        min_quality=0.7,
        pack_budget=512,
    )
    assert runner.cmd_curate(args) == 0

    wh = Warehouse(spark, wh_dir)
    audit = wh.read("curated", "document_audit")
    docs = wh.read("curated", "documents")
    pieces = wh.read("curated", "train_pieces")

    assert audit.count() == 500  # every input doc has an audit row
    assert docs.count() == audit.filter("keep").count()
    assert {r["split"] for r in docs.select("split").distinct().collect()} <= {
        "train",
        "val",
    }
    # kept docs are exactly the keep=true audit rows
    assert (
        docs.join(audit.filter("NOT keep"), "doc_id").count() == 0
    )
    # token conservation: every positive-token train doc's tokens land in
    # exactly one packed piece
    train = docs.filter("split = 'train'")
    toks = text.token_counts(train, "doc_id", "text")
    want = toks.filter("n_ws_tokens > 0").agg(F.sum("n_ws_tokens")).first()[0]
    got = pieces.agg(F.sum("piece_tokens")).first()[0]
    assert got == want
    # deterministic: rerun writes the identical split assignment
    # (collect BEFORE the rerun overwrites the files under this frame)
    b = {r["doc_id"]: r["split"] for r in docs.collect()}
    assert runner.cmd_curate(args) == 0
    a = {r["doc_id"]: r["split"] for r in wh.read("curated", "documents").collect()}
    assert a == b


def test_audit_cli_runs_and_reports(spark, capsys):
    import runner

    args = argparse.Namespace(docs_dir=SF, slice_col="source", warehouse=None)
    assert runner.cmd_audit(args) == 0
    out = capsys.readouterr().out
    assert "slices by source:" in out
    assert "dedup index:" in out
    assert "length outliers" in out
