"""DuckDB single-node baseline for the oracle-paired headline queries —
the locally-measurable stand-in for 'match-or-beat the reference's
single-node throughput at the same data scale'. Prints one JSON line in
the same shape as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from bench import HEADLINE
from duckdb_dbt_finance_warehouse_spark.sources.tables import TESTDATA_TABLES


def main() -> None:
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
    oracles = entrymod.oracle_sql()
    # per-sf oracles (scale-dependent tuning literals — see
    # suite/registry.QuerySpec.oracle_for): re-instantiate for this sf
    from duckdb_dbt_finance_warehouse_spark.suite import REGISTRY

    for _n, _spec in REGISTRY.items():
        if _spec.oracle_for is not None and _n in oracles:
            oracles[_n] = _spec.oracle_for(sf_dir)
    timings = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.time() - t0, 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_baseline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
