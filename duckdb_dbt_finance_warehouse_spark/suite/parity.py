"""Driver-semantics result comparison, shared by the local gate
(tools/check_correctness.py) and the pytest parity pins
(tests/test_oracle_parity_deferred.py).

The driver compares a Spark result and its DuckDB oracle by row count,
column-name set, and order-insensitive canonicalized values with
columns SORTED BY NAME — these helpers reproduce that exactly, so a
green here is the same evidence as a green driver CORRECTNESS row.
"""

from __future__ import annotations

import math


def canon(v) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr keeps full double precision; engines must match bitwise
        return repr(v)
    return repr(v)


def rows_key(rows, colnames):
    # sort columns by name (driver semantics), then rows
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def compare(srows, scols, drows, dcols) -> list[str]:
    """Return the list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if not problems:
        sk = rows_key([tuple(r) for r in srows], scols)
        dk = rows_key(drows, dcols)
        if sk != dk:
            diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return problems
