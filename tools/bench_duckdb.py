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


def _connect(sf_dir: str, attempts: int = 4) -> "duckdb.DuckDBPyConnection":
    """Fresh connection with views registered. Retries with a settle
    delay: immediately after an OOM teardown the old instance's memory
    has not returned to the allocator yet, and even the 2 KB CREATE
    VIEW allocation was observed failing (r10, killed the third sf1
    baseline attempt)."""
    import gc

    last = None
    for i in range(attempts):
        gc.collect()
        try:
            return _connect_once(sf_dir)
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(2 * (i + 1))
    raise last


def _connect_once(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # per-process spill dir: the default is CWD-relative ".tmp", which
    # two concurrent DuckDB processes share — one cleaning up deletes
    # the other's blocks mid-spill (fatal IOException, killed the r10
    # sf1 baseline when a parity check ran alongside it)
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    # bound the spill so a runaway replay fails fast and visibly
    # instead of filling the root disk to exhaustion mid-suite
    try:
        con.execute("SET max_temp_directory_size='40GiB'")
    except duckdb.Error:
        pass  # older DuckDB without the setting
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written layout (make_sf1): directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON line here")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    timings = {}
    failed = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None or not spec.has_oracle:
            continue
        # scale-dependent tuning literals re-instantiate for this sf
        # (see suite/registry.QuerySpec.resolved_oracle)
        sql = spec.resolved_oracle(sf_dir)
        print(f"running {name} ...", file=sys.stderr, flush=True)
        # One FRESH connection per query: a failed replay must name
        # itself and not take the rest of the baseline down, and an
        # allocator OOM POISONS its connection — every later query on
        # it fails with bad allocation (the r10 cascade: one
        # semantic_dedup OOM -> 47 bogus failures). Per-query
        # connections also keep in-suite memory state identical to a
        # solo run (list-heavy sf1 replays were observed OOMing
        # in-suite while passing solo on an unfragmented allocator).
        # Timing excludes connect/view setup (~ms). One retry per
        # query; only a second failure is recorded as real.
        err = None
        for attempt in range(2):
            try:
                con = _connect(sf_dir)
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
                continue
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                timings[name] = round(time.time() - t0, 4)
                err = None
            except Exception as e:  # noqa: BLE001 — record and continue
                err = f"{type(e).__name__}: {e}"
                print(
                    f"attempt {attempt + 1} failed for {name}: {err}",
                    file=sys.stderr, flush=True,
                )
            finally:
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
            if err is None:
                break
        if err is not None:
            failed[name] = err
            print(f"FAILED {name}: {err}", file=sys.stderr, flush=True)
            continue
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)
    payload = {
        "metric": "duckdb_oracle_baseline_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    if failed:
        payload["failed"] = failed
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
