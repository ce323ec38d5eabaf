"""Skew-handling primitives for hot-key shuffles.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory);
these are the explicit tools for the cases AQE can't fix:

- ``salted_agg``  : two-stage aggregation for a groupBy with hot keys —
  stage 1 aggregates on (key, salt), stage 2 merges the per-salt partials.
  Correct for algebraic aggregates (sum/count/min/max).
- ``salted_join`` : replicate the small side per salt, salt the big side —
  an N-way fan-out that turns one hot partition into N even ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt from a stable row hash (not rand() — keeps
    reruns and resumed stages reproducible)."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output name -> (merge_fn_name, stage1_agg_column), e.g.
    {"total": ("sum", F.sum("x")), "n": ("sum", F.count("*")),
     "mx": ("max", F.max("x"))}. Stage 1 shuffles on (keys, salt) — hot
    keys split across ``n_salts`` reducers; stage 2 merges |keys|x|salts|
    partials, which is tiny."""
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, (_, c) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return stage1.groupBy(*keys).agg(
        *[merge[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: salt the big side, replicate the small side
    across all salts (explode), join on (keys, salt). The small side
    grows n_salts x — use only when it stays broadcastable."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in on]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")
