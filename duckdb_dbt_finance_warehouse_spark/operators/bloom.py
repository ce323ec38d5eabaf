"""Portable Bloom-filter semi-join — the runtime-filter pattern for big
joins at scale.

On a 1000-executor cluster the expensive part of ``fact JOIN dim`` is
shuffling the fact side; when the join is selective, most shuffled fact
rows never match. The fix every engine applies (Spark calls it a runtime
bloom filter, `spark.sql.optimizer.runtime.bloomFilter.enabled`) is to
build a tiny bit-set over the dim keys and drop non-matching fact rows
BEFORE the exchange. This module implements that pattern explicitly with
PORTABLE hashing (md5-derived bit positions), so the filter's exact
accept/reject decisions — including its deterministic false positives —
replay bit-for-bit in the DuckDB oracle, which an engine-private filter
never could.

Shape: the bit-set is a DataFrame of DISTINCT set bit positions
(<= M_BITS rows, i.e. a few KB) broadcast to the probe side; membership
is K broadcast left-semi joins (one per hash), all against the same
broadcast table — no shuffle of the probe side, no Python. A probe row
survives iff all K of its bit positions are set: exactly Bloom
semantics, false-positive rate ~(1 - e^(-K*n/M))^K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4  # hash functions
BLOOM_M = 1 << 16  # bits


def _bit(key: F.Column, j: int) -> F.Column:
    """j-th portable bit position: md5("<j>:<key>") -> 60-bit int -> mod M."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BLOOM_M))


def bloom_bits(keys: DataFrame, key_col: str) -> DataFrame:
    """The filter itself: distinct set bit positions over the build-side
    keys. One small aggregation; merge filters by UNION DISTINCT."""
    k = F.col(key_col)
    return (
        keys.filter(k.isNotNull())
        .select(F.explode(F.array(*[_bit(k, j) for j in range(BLOOM_K)])).alias("bit"))
        .distinct()
    )


def bloom_semi_join(
    probe: DataFrame, keys: DataFrame, probe_col: str, key_col: str
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_col`` passes the Bloom filter
    built over ``keys.key_col`` — a superset of the true semi-join with
    deterministic false positives. K chained broadcast left-semi joins
    against the same broadcast bit table; the probe side is never
    shuffled."""
    bits = F.broadcast(bloom_bits(keys, key_col))
    out = probe
    for j in range(BLOOM_K):
        out = out.join(
            bits, _bit(F.col(probe_col), j) == F.col("bit"), "left_semi"
        )
    return out


def bloom_oracle_bits_sql(keys_sql: str, key_col: str) -> str:
    """DuckDB subquery producing the identical set-bit table from
    ``keys_sql`` (a subquery exposing ``key_col``)."""
    return f"""
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT
               % {BLOOM_M} AS bit
      FROM ({keys_sql}) k
      CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS j) hashes
      WHERE {key_col} IS NOT NULL
    """


def bloom_oracle_member_pred(probe_col: str, bits_cte: str) -> str:
    """DuckDB predicate: all K bit positions of ``probe_col`` are set
    (membership test replaying the Spark semi-joins verbatim)."""
    tests = [
        f"(('0x' || substr(md5('{j}:' || CAST({probe_col} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {BLOOM_M}) IN (SELECT bit FROM {bits_cte})"
        for j in range(BLOOM_K)
    ]
    return " AND ".join(tests)
