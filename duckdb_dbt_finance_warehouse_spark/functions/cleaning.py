"""Column-cleaning kit — the staging "schema contract" primitives.

Reference semantics (cited for parity checking):
- trim keys/strings: /root/reference/models/staging/stg_accounts.sql:17-24
- nullif(trim(x), '') empty-string->NULL: stg_accounts.sql:18-24
- lowercase categoricals: stg_subscriptions.sql:35
- negative money/duration -> NULL keeping a ``*_raw`` copy:
  stg_subscriptions.sql:25-28
- md5(concat_ws('|', coalesce(col,'')...)) change-detection hash:
  stg_accounts.sql:33-46

All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage-codegen friendly, no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def trim_clean(c: Column | str) -> Column:
    return F.trim(_col(c))


def empty_to_null(c: Column | str) -> Column:
    """``nullif(trim(x), '')`` — whitespace-only strings become NULL."""
    t = F.trim(_col(c))
    return F.when(t == "", F.lit(None)).otherwise(t)


def lower_norm(c: Column | str) -> Column:
    """Lowercased, trimmed, empty->NULL categorical."""
    return F.lower(empty_to_null(c))


def negative_to_null(c: Column | str) -> Column:
    """Sanitize measures: negative values are data errors -> NULL.

    Callers keep the raw column alongside (``*_raw``) per the reference's
    convention so nothing is silently lost.
    """
    col = _col(c)
    return F.when(col < 0, F.lit(None)).otherwise(col)


def canonical_str(c: Column | str) -> Column:
    """Canonical string form of any column for hashing.

    Doubles are the hazard: engine-dependent float formatting would flip
    hashes. Route doubles through DECIMAL(18,4) before stringifying when
    byte-parity with another engine matters (the caller decides; plain
    cast covers strings/dates/ints/bools identically across engines).
    """
    return F.coalesce(_col(c).cast("string"), F.lit(""))


def record_hash(cols: Iterable[Column | str], sep: str = "|") -> Column:
    """md5 of the pipe-joined, NULL-coalesced business columns.

    Used for change detection in SCD2 snapshots and as surrogate-key
    material. Matches the reference's construction
    (stg_accounts.sql:33-46): every column cast to string, NULL -> '',
    joined with '|', md5-hexed (lowercase in both Spark and DuckDB).
    """
    return F.md5(F.concat_ws(sep, *[canonical_str(c) for c in cols]))
