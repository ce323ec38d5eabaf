"""Similarity search over embedding columns (SURVEY §7.6).

- ``cosine_topk``  : exact brute-force top-k — the correctness baseline.
  Cosine is computed with zip_with/aggregate (JVM-side higher-order
  functions, float accumulated in double); per-query top-k via a window.
- ``lsh_ann_topk`` : the scale path — sign-random-projection bucketing.
  Hyperplanes are derived deterministically from murmur3 hashes (no RNG,
  reproducible across runs/engines); candidates = same-bucket vectors
  (optionally multi-probe by flipping one bit), then exact cosine within
  the bucket.

Scale notes: brute force is O(|Q| x |C|) — fine for |Q| small (probe
queries) but not for all-pairs; LSH turns it into per-bucket work. The
corpus side is never collected; queries broadcast.
"""

from __future__ import annotations

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


def _plane_dot(vec_col: str, table: int, plane: int, dim: int) -> str:
    """SQL for <v, plane> where the plane's component for dimension d is a
    deterministic +-1 from murmur3(table, plane, d) — fixed, engine-
    computable, no stored model, reproducible across runs."""
    return (
        "aggregate(zip_with({v}, sequence(0, {last}),"
        " (x, d) -> CAST(x AS DOUBLE) * (CASE WHEN pmod(hash({t}, {p}, d), 2) = 0"
        " THEN 1.0 ELSE -1.0 END)), CAST(0.0 AS DOUBLE), (acc, u) -> acc + u)"
    ).format(v=vec_col, last=dim - 1, t=table, p=plane)


def _table_buckets(vec_col: str, n_tables: int, n_planes: int, dim: int) -> F.Column:
    """Array of (table, bucket) structs: one sign-bit bucket per hash
    table. Multiple independent tables are what buys recall — a true
    neighbor colliding in ANY table becomes a candidate."""
    entries = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            dot = F.expr(_plane_dot(vec_col, t, p, dim))
            bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(0)
        entries.append(F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket")))
    return F.array(*entries)


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
    unchanged). Every corpus vector is assigned to its nearest centroid
    (the inverted lists); a query probes its ``n_probes`` nearest
    centroids and scores only those lists.

    Scale: assignment is |C| x |centroids| against a BROADCAST centroid
    table (narrow, no shuffle of the corpus); the probe join touches
    ~n_probes/|centroids| of the corpus per query instead of all of it."""
    cents = corpus.filter((F.col(id_col) % n_centroids_mod) == 0).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cent_vec"),
        F.expr(NORM.format(a=vec_col)).alias("cent_norm"),
    )

    def nearest(df: DataFrame, idc: str, vecc: str, n: int) -> DataFrame:
        # norms precomputed once per side; only the dot product is
        # evaluated per (vector, centroid) pair
        with_norm = df.withColumn("_vnorm", F.expr(NORM.format(a=vecc)))
        scored = with_norm.crossJoin(F.broadcast(cents)).select(
            F.col(idc),
            F.col(vecc),
            "centroid_id",
            F.round(
                F.expr(DOT.format(a=vecc, b="cent_vec"))
                / (F.col("_vnorm") * F.col("cent_norm")),
                6,
            ).alias("cent_cos"),
        )
        if n == 1:
            # assignment: argmax via max_by — one grouped pass, no window
            # shuffle+sort (tiebreak: lowest centroid_id wins)
            return scored.groupBy(idc).agg(
                F.first(vecc).alias(vecc),
                F.expr(
                    "max_by(centroid_id, struct(cent_cos, -centroid_id))"
                ).alias("centroid_id"),
            )
        w = Window.partitionBy(idc).orderBy(F.desc("cent_cos"), F.asc("centroid_id"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .drop("cent_cos", "crank")
        )

    lists = nearest(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")),
        "cand_id",
        "c_vec",
        1,
    )
    probes = nearest(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id",
        "q_vec",
        n_probes,
    )
    scored = (
        lists.join(probes, "centroid_id")
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


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) — brute-force all-pairs, the exactness baseline for
    embedding dedup. At 100 TB swap the cross join for the LSH bucket
    join (lsh_ann_topk's candidate stage); the scoring expression is
    shared."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine_expr("va", "vb"), 6).alias("cosine")
        )
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
    (~|C| * L / 2^b candidates per query in expectation)."""
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(_table_buckets(vec_col, n_tables, n_planes, dim)).alias("tb"),
    ).select("cand_id", "c_vec", "tb.tbl", "tb.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_table_buckets(vec_col, n_tables, n_planes, dim)).alias("tb"),
    ).select("query_id", "q_vec", "tb.tbl", "tb.bucket")
    cands = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "q_vec", "cand_id", "c_vec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "cand_id",
        F.round(cosine_expr("q_vec", "c_vec"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
