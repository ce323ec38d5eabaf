"""Deterministic spherical k-means (Lloyd's algorithm, fixed rounds) —
the trained coarse quantizer the IVF index docstring promises
("swap in k-means centroids at deployment"), built so the WHOLE fit is
engine-portable and the DuckDB oracle replays every round bit-for-bit.

Determinism stack (same contract as operators/similarity):
- components quantized to the 2^-18 grid (``_np_quant`` /
  ``round(x * 262144.0)``) — every dot product and squared norm is an
  exact integer below 2^53, summation-order-free;
- assignment = argmax quantized cosine, exact ties to the LOWEST
  centroid id (numpy argmax over cid-sorted centroids == SQL
  ``min(cid) WHERE cos = max(cos)``);
- centroid update = per-dimension mean re-quantized half-away-from-zero
  (one IEEE division of exact operands per dimension — identical in
  numpy and SQL); empty clusters keep their previous centroid;
- init = every ``seed_mod``-th id (the IVF seeding), cid-sorted.

Execution shape per round: ONE Arrow stage over the corpus (broadcast
centroid matrix, int64 BLAS) emitting per-batch per-cluster component
sums — already combined within the batch, so the shuffle carries at most
|clusters| x (dim+1) rows per batch — then a tiny (cluster, dim) sum and
a driver-side model update (k x dim ints, the documented driver-model
boundary). The corpus is scanned once per round and NEVER shuffled.
At 100 TB: rounds are linear scans; the model stays KBs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity
from .similarity import QUANT_SCALE, _np_quant


def _seed_centroids(corpus: DataFrame, id_col: str, vec_col: str, seed_mod: int):
    """Stride-seeded initial centroids. The collect is the model (k x
    dim), not the data — but k = corpus/seed_mod grows with the corpus,
    so it carries the same MAX_SEED_COLLECT cap as the IVF seeding
    (checked via limit(cap+1); past it, raise rather than pull a
    runaway row count onto the driver — pick a larger seed_mod)."""
    import numpy as np

    cap = similarity.MAX_SEED_COLLECT
    rows = (
        corpus.filter((F.col(id_col) % seed_mod) == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        raise ValueError(
            f"kmeans seeding would collect >{cap} centroids to the driver "
            f"(corpus/{seed_mod} grows with the corpus) — raise seed_mod so "
            "k stays model-sized"
        )
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    C = _np_quant(np.array([r["cvec"] for r in rows], dtype=np.float64))
    return cids, C


def _assign_kernel(bc, emit_sums: bool):
    """mapInPandas kernel: assign each batch row to its nearest centroid
    (quantized cosine, ties to lowest cid). emit_sums=True -> per-batch
    per-cluster component sums (dim rows) + a dim=-1 count row;
    emit_sums=False -> (cluster_id, member_id) rows."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        cids, C = bc.value
        cn = np.sqrt((C * C).sum(axis=1))
        # zero-norm guard: a 0-vector makes cosine NaN and argmax would
        # silently pick centroid 0 while the SQL `cos = mx` predicate
        # drops the row — raise instead (house policy: checks raise,
        # never silently diverge). Mirrored by error() in the oracle.
        if np.any(cn == 0):
            raise ValueError("kmeans: zero-norm centroid vector")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            Vq = _np_quant(V)
            vn = np.sqrt((Vq * Vq).sum(axis=1))
            if np.any(vn == 0):
                raise ValueError("kmeans: zero-norm embedding vector")
            cos = (Vq @ C.T) / (vn[:, None] * cn[None, :])
            # first max = lowest cid (centroids are cid-sorted)
            idx = np.argmax(cos, axis=1)
            if not emit_sums:
                yield pd.DataFrame(
                    {
                        "cluster_id": cids[idx],
                        "member_id": pdf["_id"].to_numpy(),
                    }
                )
                continue
            out_cid, out_dim, out_s = [], [], []
            for i in np.unique(idx):
                rows = np.nonzero(idx == i)[0]
                sums = Vq[rows].sum(axis=0)  # exact ints in f64
                dims = np.arange(len(sums), dtype=np.int32)
                out_cid.append(np.full(len(sums) + 1, cids[i]))
                out_dim.append(np.concatenate([dims, [-1]]))
                out_s.append(np.concatenate([sums, [float(rows.size)]]))
            yield pd.DataFrame(
                {
                    "cid": np.concatenate(out_cid),
                    "dim": np.concatenate(out_dim).astype(np.int32),
                    "s": np.concatenate(out_s).astype(np.int64),
                }
            )

    return kernel


# memoized trained models (dedup.ModelMemo — the frozen-model
# lifecycle): a fitted quantizer is a shipped artifact; the coarse
# IVF quantizer, SemDeDup's cluster model, and the k-means suite entry
# all train the SAME (corpus, seed_mod, n_iter) model — r13 measured
# three independent 3-round trainings per suite pass before this.
_FITTED_MODELS = None


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 32,
    n_iter: int = 3,
):
    """Run ``n_iter`` Lloyd rounds; returns (cids, C) — the centroid ids
    and the QUANT_SCALE-scaled centroid matrix (driver-side model).
    Memoized by (corpus plan semantics, params): training is the build
    event of the frozen-model lifecycle, so repeat fits over the same
    corpus return the stored model.  Treat the result as immutable."""
    import numpy as np
    from pyspark.sql import types as T

    from .dedup import ModelMemo

    global _FITTED_MODELS
    if _FITTED_MODELS is None:
        _FITTED_MODELS = ModelMemo()
    memo_key = (id_col, vec_col, seed_mod, n_iter, "kmeans_fit")
    hit = _FITTED_MODELS.get(corpus, memo_key)
    if hit is not None:
        return hit

    spark = corpus.sparkSession
    id_kind = corpus.schema[id_col].dataType.typeName()
    if id_kind not in ("byte", "short", "integer", "long"):
        raise TypeError(f"kmeans seeding needs an integral {id_col!r}; got {id_kind}")
    cids, C = _seed_centroids(corpus, id_col, vec_col, seed_mod)
    src = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    sums_schema = T.StructType(
        [
            T.StructField("cid", T.LongType()),
            T.StructField("dim", T.IntegerType()),
            T.StructField("s", T.LongType()),
        ]
    )
    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast((cids, C))
        cells = (
            src.mapInPandas(_assign_kernel(bc, emit_sums=True), sums_schema)
            .groupBy("cid", "dim")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        counts = {r["cid"]: r["s"] for r in cells if r["dim"] == -1}
        sums: dict[int, np.ndarray] = {}
        for r in cells:
            if r["dim"] >= 0:
                sums.setdefault(r["cid"], np.zeros(C.shape[1]))[r["dim"]] = r["s"]
        newC = C.copy()  # empty clusters keep their previous centroid
        for i, cid in enumerate(cids):
            n = counts.get(int(cid))
            if n:
                mean = sums[int(cid)].astype(np.float64) / float(n)
                newC[i] = np.sign(mean) * np.floor(np.abs(mean) + 0.5)
        C = newC
    # freeze the memoized arrays: every later hit returns these SAME
    # objects, and an in-place mutation by one consumer would corrupt
    # all of them (and desync _model_digest-keyed stored indexes) —
    # enforce immutability instead of documenting it (r13 ADVICE)
    cids.setflags(write=False)
    C.setflags(write=False)
    return _FITTED_MODELS.put(corpus, memo_key, (cids, C))


def kmeans_cluster_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 32,
    n_iter: int = 3,
) -> DataFrame:
    """Fit + final assignment -> (cluster_id, n_members, min_member_id):
    the order-free integer summary of the final clustering (exactly what
    the DuckDB oracle can replay without float-accumulation hazards)."""
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    cids, C = kmeans_fit(corpus, id_col, vec_col, seed_mod, n_iter)
    bc = spark.sparkContext.broadcast((cids, C))
    id_type = corpus.schema[id_col].dataType
    asg_schema = T.StructType(
        [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("member_id", id_type),
        ]
    )
    src = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    asg = src.mapInPandas(_assign_kernel(bc, emit_sums=False), asg_schema)
    return asg.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.min("member_id").alias("min_member_id"),
    )


def kmeans_oracle_ctes(
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 32,
    n_iter: int = 3,
    dim: int = 64,
) -> str:
    """CTE chain (q, vnorm, c0 .. c{n_iter}, asgF) replaying the fit —
    embed in a larger WITH to consume the trained centroids (c{n_iter})
    or the final assignment (asgF).

    Assignment rounds run in VECTOR form (per-id LISTS +
    list_inner_product + a struct-min argmax), the same restructuring
    that fixed the r8 PQ-encode spill death: the component-summed form
    (q JOIN c{{t}} USING (dim) GROUP BY vid, cid) materializes an
    N·K·D join (~800M rows/round at sf1 = 20k vectors x 625 centroids
    x 64 dims) and exhausted DuckDB's spill disk in the r10 sf1
    baseline run; the list form streams an N·K cross join (12.5M
    rows/round) through an N-group argmax. Bit-identical: every qv/qc
    is an exact integer in a DOUBLE, so list_inner_product == the
    grouped sum exactly (all products and partial sums < 2^53), the
    cosine is the same one IEEE division, and min over a
    (negcos, cid) struct is lexicographic — largest cosine, ties to
    the lowest cid, exactly the old max-window + min(cid) rule."""
    qs = f"{int(QUANT_SCALE)}.0"
    parts = [
        f"""q AS (
      SELECT {id_col} AS vid, CAST(i AS INT) AS dim,
             round(CAST({vec_col}[CAST(i AS INT) + 1] AS DOUBLE) * {qs}) AS qv
      FROM {src}, unnest(generate_series(0, {dim - 1})) AS u(i)),
    vnorm AS (SELECT vid, CASE WHEN sum(qv * qv) = 0
                  THEN error('kmeans: zero-norm embedding vector')
                  ELSE sqrt(sum(qv * qv)) END AS nv FROM q GROUP BY 1),
    vvec AS (
      SELECT l.vid, l.v, n.nv
      FROM (SELECT vid, list(qv ORDER BY dim) AS v FROM q GROUP BY 1) l
      JOIN vnorm n ON n.vid = l.vid),
    c0 AS (SELECT vid AS cid, dim, qv AS qc FROM q WHERE vid % {seed_mod} = 0)"""
    ]
    for t in range(n_iter):
        nxt = t + 1
        parts.append(
            f"""cl{t} AS (
      SELECT cid, c, CASE WHEN list_inner_product(c, c) = 0
                  THEN error('kmeans: zero-norm centroid vector')
                  ELSE sqrt(list_inner_product(c, c)) END AS nc
      FROM (SELECT cid, list(qc ORDER BY dim) AS c FROM c{t} GROUP BY 1)),
    asg{t} AS (
      SELECT v.vid,
             struct_extract(min({{'negcos':
               -(list_inner_product(v.v, c.c) / (v.nv * c.nc)),
               'cid': c.cid}}), 'cid') AS cid
      FROM vvec v CROSS JOIN cl{t} c
      GROUP BY 1),
    upd{t} AS (
      SELECT a.cid, q.dim,
             CASE WHEN CAST(sum(q.qv) AS DOUBLE) / count(*) >= 0
                  THEN floor(CAST(sum(q.qv) AS DOUBLE) / count(*) + 0.5)
                  ELSE -floor(abs(CAST(sum(q.qv) AS DOUBLE) / count(*)) + 0.5)
             END AS qc
      FROM asg{t} a JOIN q ON q.vid = a.vid GROUP BY 1, 2),
    c{nxt} AS (
      SELECT c.cid, c.dim, COALESCE(u.qc, c.qc) AS qc
      FROM c{t} c LEFT JOIN upd{t} u ON u.cid = c.cid AND u.dim = c.dim)"""
        )
    T = n_iter
    parts.append(
        f"""clF AS (
      SELECT cid, c, CASE WHEN list_inner_product(c, c) = 0
                  THEN error('kmeans: zero-norm centroid vector')
                  ELSE sqrt(list_inner_product(c, c)) END AS nc
      FROM (SELECT cid, list(qc ORDER BY dim) AS c FROM c{T} GROUP BY 1)),
    asgF AS (
      SELECT v.vid,
             struct_extract(min({{'negcos':
               -(list_inner_product(v.v, c.c) / (v.nv * c.nc)),
               'cid': c.cid}}), 'cid') AS cid
      FROM vvec v CROSS JOIN clF c
      GROUP BY 1)"""
    )
    return ",\n    ".join(parts)


def kmeans_oracle_sql(
    src: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 32,
    n_iter: int = 3,
    dim: int = 64,
) -> str:
    """DuckDB SQL replaying the full fit: quantized components, n_iter
    assignment+update rounds (identical arithmetic, identical
    tie-breaks), final cluster stats."""
    body = kmeans_oracle_ctes(src, id_col, vec_col, seed_mod, n_iter, dim)
    return f"""
    WITH {body}
    SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(vid) AS BIGINT) AS min_member_id
    FROM asgF GROUP BY 1
    """
