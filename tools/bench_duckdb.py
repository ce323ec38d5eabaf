"""DuckDB single-node baseline for the oracle-paired headline queries —
the locally-measurable stand-in for 'match-or-beat the reference's
single-node throughput at the same data scale'. Prints one JSON line in
the same shape as bench.py; ``--out FILE`` also writes it to disk so
per-query Spark/DuckDB ratios are machine-checkable round over round
(see tools/bench_ratio.py), not PERF.md prose.

Robustness (hard-won in the r10 sf1 runs): a list-heavy replay at sf1
can OOM DuckDB's allocator, and the damage is PROCESS-wide — a poisoned
shared connection fails every later query (one semantic_dedup OOM ->
47 bogus failures), a reconnect milliseconds later still can't allocate
2 KB, and even per-query fresh connections eventually starve because
freed arena memory never returns to the OS within the process. So the
suite runs in a WORKER SUBPROCESS (one fresh connection per query) and
the parent respawns it from the crash point when it dies, marking the
query it died on as failed — full OS-level memory isolation, at most
one respawn's import cost per genuine failure.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from duckdb_dbt_finance_warehouse_spark.sources.tables import TESTDATA_TABLES
from duckdb_dbt_finance_warehouse_spark.suite import REGISTRY


def _eligible() -> list[str]:
    out = []
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is not None and spec.has_oracle:
            out.append(name)
    return out


def _connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # per-process spill dir: the default is CWD-relative ".tmp", which
    # two concurrent DuckDB processes share — one cleaning up deletes
    # the other's blocks mid-spill (fatal IOException, killed an r10
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


def worker(sf_dir: str, start: int) -> None:
    """Run queries [start:] each on a fresh connection, emitting a
    machine-parseable line per query on stdout: ``RUN <i> <name>`` then
    ``OK <i> <name> <secs>`` or ``FAIL <i> <name> <err>``. A hard death
    (allocator starvation, OOM-kill) leaves the parent a RUN line to
    resume after."""
    names = _eligible()
    for i in range(start, len(names)):
        name = names[i]
        spec = REGISTRY.get(name)
        print(f"RUN {i} {name}", flush=True)
        try:
            # AFTER the RUN line and inside a try: oracle_for specs read
            # parquet footers here, and a deterministic resolution
            # failure must charge THIS query (record-and-continue), not
            # crash the worker pre-RUN — that shape respawns into the
            # same crash and the stall guard aborts the whole artifact
            sql = spec.resolved_oracle(sf_dir)
        except Exception as e:  # noqa: BLE001
            err = f"oracle resolution: {type(e).__name__}: {e}".replace("\n", " ")
            print(f"FAIL {i} {name} {err}", flush=True)
            continue
        try:
            con = _connect(sf_dir)
        except Exception as e:  # noqa: BLE001
            # a failed CONNECT means this process's arena is starved
            # (freed DuckDB memory never returns to the OS) — every
            # later connect in this process would fail too (the r10b
            # sf1 run cascaded 7 bogus failures this way). Hand the
            # query back to the parent for ONE retry in a fresh
            # process instead of recording it failed here.
            err = f"connect: {type(e).__name__}: {e}".replace("\n", " ")
            print(f"FAILCONN {i} {name} {err}", flush=True)
            sys.exit(3)
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            print(f"OK {i} {name} {round(time.time() - t0, 4)}", flush=True)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}".replace("\n", " ")
            print(f"FAIL {i} {name} {err}", flush=True)
            if "OutOfMemory" in err or "bad allocation" in err:
                # the replay itself exhausted the arena: the failure is
                # recorded, but DON'T keep running in this poisoned
                # process — exit so the parent respawns fresh for the
                # REMAINING queries (parent resumes from i+1, no blame)
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                sys.exit(3)
        finally:
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON line here")
    ap.add_argument("--worker-start", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if args.worker_start is not None:
        worker(sf_dir, args.worker_start)
        return

    names = _eligible()
    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    conn_retried: set[int] = set()
    nxt = 0
    stalls = 0
    while nxt < len(names):
        before = nxt
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker-start", str(nxt)],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir),
        )
        running: tuple[int, str] | None = None
        for line in proc.stdout:
            parts = line.rstrip("\n").split(" ", 3)
            if parts[0] == "RUN":
                running = (int(parts[1]), parts[2])
                print(f"running {parts[2]} ...", file=sys.stderr, flush=True)
            elif parts[0] == "OK":
                timings[parts[2]] = float(parts[3])
                nxt = int(parts[1]) + 1
                running = None
                print(f"  {parts[2]}: {parts[3]}s", file=sys.stderr, flush=True)
            elif parts[0] == "FAIL":
                failed[parts[2]] = parts[3]
                nxt = int(parts[1]) + 1
                running = None
                print(f"FAILED {parts[2]}: {parts[3]}", file=sys.stderr, flush=True)
            elif parts[0] == "FAILCONN":
                # the worker's arena was starved before this query even
                # started (it exits right after this line): retry the
                # SAME query once in the fresh respawn; only a second
                # connect failure — fresh process, so genuinely this
                # query's environment — records it as failed
                i = int(parts[1])
                running = None
                if i in conn_retried:
                    failed[parts[2]] = parts[3]
                    nxt = i + 1
                    print(f"FAILED {parts[2]}: {parts[3]}", file=sys.stderr, flush=True)
                else:
                    conn_retried.add(i)
                    nxt = i
                    print(
                        f"connect-OOM before {parts[2]}; retrying in a fresh worker",
                        file=sys.stderr, flush=True,
                    )
        rc = proc.wait()
        # a hard-killed DuckDB cannot delete its own spill blocks, and
        # every respawn gets a new pid (new /tmp/duckdb_spill_<pid>) —
        # without this, a crashy sf1 run strands tens of GiB in /tmp
        shutil.rmtree(f"/tmp/duckdb_spill_{proc.pid}", ignore_errors=True)
        if rc != 0 and running is not None:
            # the worker died mid-query (hard OOM / kernel kill):
            # charge the death to that query and resume after it
            failed[running[1]] = f"worker died (rc {rc}) during replay"
            nxt = running[0] + 1
            print(
                f"FAILED {running[1]}: worker died (rc {rc}); respawning",
                file=sys.stderr, flush=True,
            )
        elif rc != 0 and running is None:
            # died between queries — resume from nxt without blame
            print(f"worker died idle (rc {rc}); respawning", file=sys.stderr, flush=True)
        # no-progress guard: a worker dying before its first RUN line
        # (import failure, bad interpreter) must not respawn forever
        stalls = stalls + 1 if nxt == before else 0
        if stalls >= 3:
            raise SystemExit(f"worker made no progress after {stalls} respawns at index {nxt}")

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
