"""DuckDB single-node baseline for the oracle-paired headline queries —
the locally-measurable stand-in for 'match-or-beat the reference's
single-node throughput at the same data scale'. Prints one JSON line in
the same shape as bench.py; ``--out FILE`` also writes it to disk so
per-query Spark/DuckDB ratios are machine-checkable round over round
(see tools/bench_ratio.py), not PERF.md prose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from duckdb_dbt_finance_warehouse_spark.sources.tables import TESTDATA_TABLES
from duckdb_dbt_finance_warehouse_spark.suite import REGISTRY


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON line here")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written layout (make_sf1): directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    timings = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None or not spec.has_oracle:
            continue
        # scale-dependent tuning literals re-instantiate for this sf
        # (see suite/registry.QuerySpec.resolved_oracle)
        sql = spec.resolved_oracle(sf_dir)
        t0 = time.time()
        con.execute(sql).fetchall()
        timings[name] = round(time.time() - t0, 4)
    line = json.dumps(
        {
            "metric": "duckdb_oracle_baseline_total",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf),
        }
    )
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
