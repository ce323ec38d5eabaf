"""Generate PLANS.md — one summary row per headline query: exchanges,
join strategies, Python/Arrow eval nodes, scan pushdown, window specs.
The compact, greppable version of `.explain("formatted")` across the
suite, refreshed per round so plan regressions are visible in diffs.

Usage: python tools/plan_report.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from duckdb_dbt_finance_warehouse_spark.session import get_spark
from duckdb_dbt_finance_warehouse_spark.suite import REGISTRY


def summarize(plan: str) -> dict[str, object]:
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    return {
        "exchanges": plan.count("Exchange ("),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "arrow": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapCoGroupsInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "py_row": plan.count("BatchEvalPython"),
        "windows": plan.count("Window ("),
        "group_limit": plan.count("WindowGroupLimit"),
        "pushed": sum(1 for p in pushed if p.strip()),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    args = ap.parse_args()

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — per-query physical-plan summary (auto-generated)",
        "",
        f"`python tools/plan_report.py --sf {args.sf}` — counts of the",
        "scale-critical plan nodes per headline query. Invariants the suite",
        "holds everywhere: no BroadcastNestedLoopJoin/CartesianProduct",
        "outside the constant-size 1-row-bound allowlist at the foot of",
        "this file (column `bnlj`; tests/test_plans.BNLJ_ALLOWED), zero",
        "row-at-a-time Python (`py_row`), every window partitioned",
        "(tests/test_plans.py pins the shapes).",
        "",
        "| query | exchanges | BHJ | SMJ | bnlj | arrow | py_row | windows | WindowGroupLimit | scans w/ pushdown |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    from tests.test_plans import BNLJ_ALLOWED

    bad: list[str] = []
    allowed_hits: list[str] = []
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        df = spec.fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        s = summarize(buf.getvalue())
        if s["py_row"] or (s["bnlj"] and name not in BNLJ_ALLOWED):
            bad.append(name)
        elif s["bnlj"]:
            allowed_hits.append(name)
        lines.append(
            f"| {name} | {s['exchanges']} | {s['bhj']} | {s['smj']} | {s['bnlj']} |"
            f" {s['arrow']} | {s['py_row']} | {s['windows']} | {s['group_limit']} |"
            f" {s['pushed']} |"
        )
    lines.append("")
    lines.append(
        "Violations (row-Python, or BNLJ outside the tiny-broadcast "
        "allowlist): " + (", ".join(bad) if bad else "none.")
    )
    if allowed_hits:
        lines.append(
            "Allow-listed BNLJ (constant-size 1-row/bound build sides — "
            "tests/test_plans.BNLJ_ALLOWED): " + ", ".join(allowed_hits) + "."
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(lines)} lines); violations: {bad or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
