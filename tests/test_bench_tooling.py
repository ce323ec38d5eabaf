"""The bench artifact pipeline (r8 VERDICT item 3): the driver's
BENCH_r{N}.json keeps only ~2 KB of stdout tail, so bench.py persists
the full per-query map to a BENCH_full_sf*.json sidecar and
tools/bench_ratio.py must recover timings from every artifact shape it
can meet — a plain bench.py JSON-lines stream, the driver's
pretty-printed tail wrapper with a matching sidecar, and a truncated
tail with no sidecar (partial scrape, warned). No Spark needed."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_ratio", os.path.join(REPO, "tools", "bench_ratio.py")
)
bench_ratio = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spec and bench_ratio)


def _full_line(total, queries, sf=0.1):
    return json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
        }
    )


def _compact_line(total, n, sf=0.1):
    return json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n": n,
        }
    )


def test_load_plain_bench_stream_prefers_full_map(tmp_path):
    q = {"a": 1.25, "b": 0.5}
    p = tmp_path / "bench.json"
    p.write_text(
        _compact_line(1.75, 2) + "\n" + _full_line(1.75, q) + "\n"
        + _compact_line(1.75, 2) + "\n"
    )
    assert bench_ratio._load(str(p))["queries"] == q


def test_load_driver_wrapper_recovers_from_sidecar(tmp_path):
    q = {f"q{i}": round(0.1 * i, 4) for i in range(40)}
    total = round(sum(q.values()), 4)
    sidecar = tmp_path / "BENCH_full_sf0.1.json"
    sidecar.write_text(_full_line(total, q) + "\n")
    # a stale sidecar from a different run must NOT match
    stale = tmp_path / "BENCH_full_sf0.001.json"
    stale.write_text(_full_line(99.9, {"zz": 99.9}, sf=0.001) + "\n")
    # nor may one whose rounded total COINCIDES but whose sf differs
    # (r9 ADVICE: value-only matching silently adopted cross-sf maps) —
    # alphabetically first so a value-only matcher would pick it up
    coincide = tmp_path / "BENCH_full_sf0.01.json"
    coincide.write_text(_full_line(total, {"zz": total}, sf=0.01) + "\n")
    tail = (_full_line(total, q) + "\n" + _compact_line(total, len(q)) + "\n")[-200:]
    wrapper = tmp_path / "BENCH_r99.json"
    wrapper.write_text(
        json.dumps(
            {
                "n": 8,
                "rc": 0,
                "sf": 0.1,
                "tail": tail,
                "parsed": json.loads(_compact_line(total, len(q))),
            },
            indent=2,
        )
    )
    got = bench_ratio._load(str(wrapper))
    assert got["queries"] == q


def test_load_driver_wrapper_partial_scrape_without_sidecar(tmp_path, capsys):
    q = {"alpha": 0.111, "beta": 2.5, "gamma": 0.033}
    total = 2.644
    # tail truncated mid-map: only beta/gamma survive, no full line
    tail = '"beta": 2.5, "gamma": 0.033}, "sf": 0.1}\n' + _compact_line(total, 3)
    wrapper = tmp_path / "BENCH_r98.json"
    wrapper.write_text(
        json.dumps({"tail": tail, "parsed": json.loads(_compact_line(total, 3))})
    )
    got = bench_ratio._load(str(wrapper))
    assert got["queries"] == {"beta": 2.5, "gamma": 0.033}
    assert "truncated driver tail" in capsys.readouterr().err


def test_round_artifacts_on_disk_still_parse():
    """The actual r8 driver wrapper (truncated tail, no matching
    sidecar in-repo) and the r9 DuckDB baseline must both load —
    the regression the r8 verdict flagged (bench_ratio threw
    JSONDecodeError on BENCH_r08.json)."""
    r8 = os.path.join(REPO, "BENCH_r08.json")
    if os.path.exists(r8):
        got = bench_ratio._load(r8)
        assert got.get("queries"), "no timings recovered from BENCH_r08.json"
    duck = os.path.join(REPO, "BASELINE_DUCKDB_r08.json")
    if os.path.exists(duck):
        assert bench_ratio._load(duck)["queries"]
