"""Exact-sum numeric statistics (SURVEY §7.6 pipeline hygiene).

Pearson correlation over N columns usually needs N(N+1)/2 floating
sums, each summation-order-dependent — unverifiable cross-engine. Here
every moment (Σx, Σx², Σxy) is an EXACT int64 sum of scaled-integer
per-row products (scales chosen so the largest sum stays < 2^63 at the
target SF), cast ONCE to double, and the correlation is a fixed IEEE
expression over those identical doubles — bit-identical in any engine.

Scale: all moments accumulate in ONE grouped pass over the scan
(map-side combine, no shuffle of row data, a single 1-row result); the
pair matrix explodes from that row, so the corpus is scanned exactly
once regardless of how many column pairs are requested.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corr_matrix(df: DataFrame, cols: list[tuple[str, int]]) -> DataFrame:
    """Pairwise Pearson correlations for ``cols`` = [(name, scale)]:
    each column is quantized to ``floor(x * scale + 0.5)`` (pick scales
    so Σ(scaled²) < 2^63 at your SF — integral columns take scale 1).
    Output: (col_a, col_b, n_rows, corr), one row per unordered pair.

    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²)),
    evaluated in double on exactly-summed operands; the DuckDB oracle
    spells the identical expression, so results match bit-for-bit."""
    names = [c for c, _ in cols]
    scaled = df.select(
        *[
            F.floor(F.col(c) * F.lit(s) + F.lit(0.5)).cast("long").alias(c)
            for c, s in cols
        ]
    )
    aggs = [F.count("*").alias("_n")]
    for c in names:
        aggs.append(F.sum(c).alias(f"_s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"_ss_{c}"))
    for a, b in combinations(names, 2):
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"_sp_{a}_{b}"))
    m = scaled.agg(*aggs)

    def corr_expr(a: str, b: str) -> F.Column:
        n = F.col("_n").cast("double")
        sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
        ssa, ssb = F.col(f"_ss_{a}").cast("double"), F.col(f"_ss_{b}").cast("double")
        sp = F.col(f"_sp_{a}_{b}").cast("double")
        num = n * sp - sa * sb
        den = F.sqrt((n * ssa - sa * sa) * (n * ssb - sb * sb))
        return F.round(num / den, 6)

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("_n").alias("n_rows"),
                corr_expr(a, b).alias("corr"),
            )
            for a, b in combinations(names, 2)
        ]
    )
    return m.select(F.explode(pairs).alias("_r")).select("_r.*")


def corr_matrix_oracle_sql(
    src: str, cols: list[tuple[str, int]], where: str = "TRUE"
) -> str:
    """DuckDB replay: identical scaled int64 sums (CAST the HUGEINT
    totals back to BIGINT — values fit by scale design), identical
    double expression."""
    names = [c for c, _ in cols]
    sums = ["CAST(count(*) AS BIGINT) AS _n"]
    for c, s in cols:
        sums.append(f"CAST(SUM(_q_{c}) AS BIGINT) AS _s_{c}")
        sums.append(f"CAST(SUM(_q_{c} * _q_{c}) AS BIGINT) AS _ss_{c}")
    for a, b in combinations(names, 2):
        sums.append(f"CAST(SUM(_q_{a} * _q_{b}) AS BIGINT) AS _sp_{a}_{b}")
    quants = ", ".join(
        f"CAST(floor({c} * {s} + 0.5) AS BIGINT) AS _q_{c}" for c, s in cols
    )
    selects = []
    for a, b in combinations(names, 2):
        expr = (
            f"round((CAST(_n AS DOUBLE) * CAST(_sp_{a}_{b} AS DOUBLE)"
            f" - CAST(_s_{a} AS DOUBLE) * CAST(_s_{b} AS DOUBLE))"
            f" / sqrt((CAST(_n AS DOUBLE) * CAST(_ss_{a} AS DOUBLE)"
            f" - CAST(_s_{a} AS DOUBLE) * CAST(_s_{a} AS DOUBLE))"
            f" * (CAST(_n AS DOUBLE) * CAST(_ss_{b} AS DOUBLE)"
            f" - CAST(_s_{b} AS DOUBLE) * CAST(_s_{b} AS DOUBLE))), 6)"
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, _n AS n_rows,"
            f" {expr} AS corr FROM m"
        )
    return (
        f"WITH q AS (SELECT {quants} FROM {src} WHERE {where}),\n"
        f"m AS (SELECT {', '.join(sums)} FROM q)\n"
        + "\nUNION ALL\n".join(selects)
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 10,
    min_points: int = 5,
    z_threshold: float = 3.0,
    scale: int = 10_000,
) -> DataFrame:
    """Streaming-shaped anomaly detection: each value is z-scored
    against the TRAILING ``window`` observations of its key (current
    row excluded — a spike must not dilute its own baseline); |z| >=
    ``z_threshold`` flags the anomaly, and keys with fewer than
    ``min_points`` trailing observations emit z = NULL (cold start).

    Exactness: values quantize to ``scale`` ints, the frame sums
    (Σv, Σv²) are exact longs over a deterministic ROWS frame, and
    z = (v − μ)/σ evaluates as one fixed IEEE expression over those
    exact ints — bit-identical in the DuckDB oracle (pick ``scale``
    so window·max(v·scale)² < 2^63).

    Shape: ONE key-partitioned window exchange computes both frame
    sums; everything else is a narrow projection. At 100 TB this is
    the same single shuffle the sessionizer pays, keyed on the entity
    id."""
    from pyspark.sql import Window as W

    vq = F.floor(F.col(value_col) * F.lit(scale) + F.lit(0.5)).cast("long")
    frame = (
        W.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    base = df.withColumn("_vq", vq).select(
        key_col,
        *order_cols,
        F.col(value_col),
        "_vq",
        F.count("_vq").over(frame).alias("_n"),
        F.sum("_vq").over(frame).alias("_s"),
        F.sum(F.col("_vq") * F.col("_vq")).over(frame).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean = s / n
    var = (n * ss - s * s) / (n * n)
    z = F.when(
        (F.col("_n") >= min_points) & ((n * ss - s * s) > 0),
        F.round((F.col("_vq").cast("double") - mean) / F.sqrt(var), 6),
    )
    return base.select(
        key_col,
        *order_cols,
        value_col,
        F.col("_n").alias("n_trailing"),
        z.alias("z"),
        F.when(z.isNull(), F.lit(False)).otherwise(
            F.abs(z) >= F.lit(z_threshold)
        ).alias("is_anomaly"),
    )
