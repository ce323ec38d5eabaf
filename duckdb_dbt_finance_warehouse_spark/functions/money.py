"""Deterministic money aggregation.

Money in the reference is DOUBLE (stg_subscriptions.sql:25-28) with
1e-4 reconciliation tolerance (tests/test_waterfall_ties_out.sql:20-22).
Plain double SUM is order-dependent — different partitionings (or
different engines) produce last-ulp differences, which breaks exact
value-hash comparison against an oracle and makes reruns non-reproducible.

``exact_sum`` sums through DECIMAL(18,4): addition is exact, so the
result is independent of partitioning/merge order, then it is cast back
to DOUBLE for a stable output schema. The per-row double->decimal
rounding is well-defined (money has <=4 significant decimals, far above
double noise). This costs a few % over a raw double sum and buys bitwise
determinism at any parallelism — the right trade for a 1000-executor run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


DECIMAL = "decimal(18,4)"


def exact_sum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a money double, returned as double.

    ``scale`` must cover the expression's TRUE decimal precision: if the
    value has more real decimals than ``scale``, the double->decimal
    rounding can land on exact half-way ties, which HALF_UP (Spark) and
    half-even (DuckDB) break differently. E.g. a 2dp*2dp*2dp product has
    6 real decimals -> use scale=6.
    """
    return F.sum(_col(c).cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(c: Column | str) -> Column:
    """AVG as exact-sum / count — deterministic to the last bit."""
    col = _col(c)
    return (F.sum(col.cast(DECIMAL)).cast("double") / F.count(col)).cast("double")
