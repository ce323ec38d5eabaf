"""Per-query Spark/DuckDB ratio report — the machine-checkable form of
the BASELINE.md target (Spark total <= 2x DuckDB at the same sf).

Usage: python tools/bench_ratio.py BENCH.json DUCKDB.json [--worse-than 2.0]

Reads a bench.py JSON line and a tools/bench_duckdb.py JSON line
(``--out`` artifact), joins the per-query maps, prints the aggregate
ratio, and lists every paired query whose Spark/DuckDB ratio exceeds
the threshold (default 2x) sorted worst-first — the regression list a
round-over-round diff can assert on, instead of judging PERF.md prose
by eye.  Exit code 0 always: ratios are a report, not a gate (absolute
sub-second floors dominate many of the worst ratios).
"""

from __future__ import annotations

import argparse
import json


def _load(path: str) -> dict:
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                # bench.py emits a compact headline line WITHOUT the
                # per-query map alongside the full one — prefer the full
                if d.get("queries"):
                    return d
                best = best or d
    if best is not None:
        return best
    raise SystemExit(f"{path}: no JSON line found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("duckdb_json")
    ap.add_argument("--worse-than", type=float, default=2.0)
    args = ap.parse_args()
    b = _load(args.bench_json)
    d = _load(args.duckdb_json)
    bq, dq = b.get("queries", {}), d.get("queries", {})
    paired = sorted(set(bq) & set(dq))
    if not paired:
        raise SystemExit("no paired queries between the two files")
    bt = sum(bq[q] for q in paired)
    dt = sum(dq[q] for q in paired)
    print(
        f"paired queries: {len(paired)}  spark {bt:.1f}s  duckdb {dt:.1f}s  "
        f"aggregate ratio {bt / dt:.3f}x (target <= 2.0x)"
    )
    worse = sorted(
        (
            (bq[q] / dq[q] if dq[q] > 0 else float("inf"), q)
            for q in paired
            if dq[q] == 0 or bq[q] / dq[q] > args.worse_than
        ),
        reverse=True,
    )
    for ratio, q in worse:
        print(f"  {ratio:8.1f}x  {q}  spark={bq[q]:.3f}s duckdb={dq[q]:.3f}s")
    if not worse:
        print(f"  (no query worse than {args.worse_than}x)")


if __name__ == "__main__":
    main()
