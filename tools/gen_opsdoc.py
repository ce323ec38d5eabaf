"""Generate OPERATORS.md — one row per registry entry (name, source
module, oracle pairing, first docstring sentence) — so users and
reviewers can navigate the 160-entry surface without reading
suite/*.py. Rerun after adding entries:

    python tools/gen_opsdoc.py
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_dbt_finance_warehouse_spark.suite import DRIVER_PRIORITY, REGISTRY


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    flat = " ".join(doc.split())
    m = re.match(r"(.+?\.)(\s|$)", flat)
    s = m.group(1) if m else flat
    return s.replace("|", "\\|")


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    lines = [
        "# Operator reference (generated — `python tools/gen_opsdoc.py`)",
        "",
        f"{len(REGISTRY)} registry entries; every entry is a `queries()` "
        "callable `(spark, sf_dir) -> DataFrame`. `oracle` = DuckDB SQL "
        "replay exists (the driver hash-compares results) — since r8 "
        "EVERY entry is oracle-paired, and since r9 the multimodal "
        "decode is a REAL PNG decode (operators/png) whose pixel stats "
        "the oracle replays through the lossless round-trip. `window` "
        "marks membership in the driver's 50-entry per-round "
        "correctness rotation (CLAUDE.md).",
        "",
        "| entry | module | oracle | window | summary |",
        "|---|---|---|---|---|",
    ]
    window = set(DRIVER_PRIORITY[:50])
    for name, spec in sorted(REGISTRY.items()):
        mod = inspect.getmodule(spec.fn).__name__.rsplit(".", 1)[-1]
        lines.append(
            f"| {name} | suite/{mod}.py | "
            f"{'yes' if spec.has_oracle else 'rows-only'} | "
            f"{'yes' if name in window else ''} | {first_sentence(spec.doc)} |"
        )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(REGISTRY)} entries)")


if __name__ == "__main__":
    main()
