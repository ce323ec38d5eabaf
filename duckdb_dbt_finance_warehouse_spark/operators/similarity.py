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
    """Exact top-k by QUANTIZED cosine for each query vector (excluding
    self-match) — the brute-force correctness baseline every ANN path
    is audited against.

    The probe panel is collected driver-side (model-sized state, capped
    by ``_collect_queries`` — a panel past the cap is a probe TABLE and
    takes the cogrouped path) and broadcast into ONE numpy map stage
    over the corpus: dense vector math through the interpreted
    higher-order-function route paid ~5x (CodegenFallback per element;
    the CLAUDE.md slow path — measured 1.6 s vs 0.3 s for 20k x 16 x 64
    at sf1). Components are quantized (``QUANT_SCALE``) so every dot
    and norm is an exact float64 integer — addition-order-free, which
    is exactly what lets a numpy BLAS sum replace the left-to-right SQL
    sum with bit-identical scores — and the DuckDB oracle replays the
    same quantized expression. Each Arrow batch emits only its LOCAL
    top-k per query under the total order (cosine DESC, cand_id ASC)
    — no ties possible, ids are unique — so the global window's input
    is (batches x panel x k), never corpus-sized: the 100 TB shape."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = _collect_queries(
        queries, id_col, vec_col, "cosine_topk",
        "lsh_probe_buckets_topk / ivf_probe_table_topk",
    )
    qids = np.array([r["query_id"] for r in rows])
    Qq = _np_quant(np.array([r["q_vec"] for r in rows], dtype=np.float64))
    qn = np.sqrt((Qq * Qq).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Qq, qn))
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("cand_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        qids_, Qq_, qn_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            if len(pdf) == 0 or nq == 0:
                continue
            X = _np_quant(np.stack(pdf["_vec"].to_numpy()).astype(np.float64))
            xn = np.sqrt((X * X).sum(axis=1))
            C = (Qq_ @ X.T) / (qn_[:, None] * xn[None, :])
            # ROUND(x, 6) half away from zero, as both SQL engines do
            C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
            cids = pdf["_cid"].to_numpy()
            out_q, out_c, out_s = [], [], []
            kk = min(k, len(cids))
            for qi in range(nq):
                scores = C[qi]
                mask = cids != qids_[qi]  # self-match drop
                c_ids = cids[mask]
                s = scores[mask]
                if len(c_ids) == 0:
                    continue
                # exact local top-k under (cosine DESC, cand_id ASC):
                # lexsort is a total order (ids unique), so merging
                # per-batch top-k equals the global top-k
                order = np.lexsort((c_ids, -s))[:kk]
                out_q.append(np.repeat(qids_[qi], len(order)))
                out_c.append(c_ids[order])
                out_s.append(s[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    scored = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_vec")
    ).mapInPandas(score, out_schema)
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


def _sign_matrix(n_tables: int, n_planes: int, dim: int):
    """(n_tables*n_planes, dim) ±1 matrix from ``plane_signs``, row
    t*n_planes+p = plane p of table t."""
    import numpy as np

    return np.array(
        [
            plane_signs(t, p, dim)
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )


def _np_bucket_ids(V, S, n_tables: int, n_planes: int):
    """(B, n_tables) bucket ids: bit p of table t set iff the QUANTIZED
    dot with plane (t, p) is positive. Quantized components make every
    plane dot an exact float64 integer (products are ±quantized values,
    partial sums integers << 2^53), so the sign — and therefore the
    bucket — is engine-independent with no rounding rule at all."""
    import numpy as np

    P = _np_quant(V) @ S.T  # exact integers
    bits = (P > 0).astype(np.int64).reshape(len(V), n_tables, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return (bits * weights[None, None, :]).sum(axis=2)


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
    table becomes a candidate.

    One narrow Arrow stage: all n_tables x n_planes plane dots are a
    single BLAS matmul per batch against the broadcast ±1 sign matrix
    (quantized-exact — see ``_np_bucket_ids``; the interpreted
    higher-order-function form costs ~10x more). Output is ids only (no
    vector payload), so the downstream bucket self-join shuffles only
    ids."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    S = _sign_matrix(n_tables, n_planes, dim)
    bc = df.sparkSession.sparkContext.broadcast(S)
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def assign(batches):
        S_ = bc.value
        tbls = np.arange(n_tables, dtype=np.int32)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            buckets = _np_bucket_ids(V, S_, n_tables, n_planes)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_tables),
                    "tbl": np.tile(tbls, n),
                    "bucket": buckets.ravel(),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col).alias("_vec")).mapInPandas(
        assign, schema
    )


def lsh_buckets_oracle_sql(
    src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB SQL computing the identical (id, tbl, bucket) assignment:
    the same literal ±1 planes over the same quantized components —
    exact integer dots, so the sign test needs no rounding rule."""
    qs = f"{int(QUANT_SCALE)}.0"
    selects = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            arr = "[" + ", ".join(
                "1.0" if s > 0 else "-1.0" for s in plane_signs(t, p, dim)
            ) + "]"
            dot = (
                f"list_sum(list_transform(list_zip({vec_col}, {arr}),"
                f" z -> round(CAST(z[1] AS DOUBLE) * {qs}) * CAST(z[2] AS DOUBLE)))"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END)")
        selects.append(
            f"SELECT {id_col}, {t} AS tbl,"
            f" CAST({' + '.join(bits)} AS BIGINT) AS bucket FROM {src}"
        )
    return "(" + "\nUNION ALL\n".join(selects) + ")"


# Quantization scale for the IVF assignment metric: components are
# rounded to integer multiples of 2^-18. A power of two makes v * SCALE
# exact in float64, and every quantized product / partial sum is an
# integer far below 2^53 — so dots and squared norms are EXACT in
# float64 regardless of summation order. BLAS np.dot, a JVM fold, and
# DuckDB's list_sum all produce the same bits by construction; no
# round-before-compare is needed anywhere in the assignment.
QUANT_SCALE = float(1 << 18)


def _np_quant(V):
    """Half-away-from-zero round of V * QUANT_SCALE (matches SQL
    round()); V * QUANT_SCALE is exact, so both engines round the same
    value."""
    import numpy as np

    Y = V * QUANT_SCALE
    return np.sign(Y) * np.floor(np.abs(Y) + 0.5)


def _np_quant_cos_pre(Xq, Cq, xnorms, cnorms):
    """Quantized-cosine matrix for pre-quantized sides: exact integer
    dots (BLAS) over exact integer norms — deterministic IEEE ops only,
    bit-identical to any SQL replay of the same quantized expression."""
    return (Xq @ Cq.T) / (xnorms[:, None] * cnorms[None, :])


MAX_SEED_COLLECT = 4096
MAX_QUERY_COLLECT = 1 << 17


def _collect_queries(queries, id_col, vec_col, caller: str, table_variant: str):
    """Driver-side query collect for the small-probe serving paths.
    Capped (via limit(cap+1) — the probe job never pulls the runaway
    set): a query side big enough to trip this is a TABLE, and the
    cogrouped table-probe path handles it without any driver collect."""
    rows = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .limit(MAX_QUERY_COLLECT + 1)
        .collect()
    )
    if len(rows) > MAX_QUERY_COLLECT:
        raise ValueError(
            f"{caller}: >{MAX_QUERY_COLLECT} query vectors is a probe TABLE, "
            f"not a driver-side probe set — use {table_variant} (cogrouped "
            "bucket/centroid join, no driver collect)"
        )
    return rows


def _seed_centroids(corpus, id_col, vec_col, n_centroids_mod, caller: str):
    """Driver-side centroid seeding for the UNTRAINED IVF path: collect
    every ``id % n_centroids_mod == 0`` row. The seed count grows
    linearly with the corpus, so it is hard-capped at
    ``MAX_SEED_COLLECT`` (checked via ``limit(cap+1)`` — the job
    scans at most cap+1 rows, never the runaway set). Past the cap,
    train centroids distributed (operators/kmeans.kmeans_fit — the
    x_ann_ivf_trained flow) and pass them as ``model=``; seeding by id
    stride was only ever a deterministic stand-in for training."""
    import numpy as np

    cent_rows = (
        corpus.filter((F.col(id_col) % n_centroids_mod) == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(MAX_SEED_COLLECT + 1)
        .collect()
    )
    if len(cent_rows) > MAX_SEED_COLLECT:
        raise ValueError(
            f"{caller}: untrained centroid seeding would collect "
            f">{MAX_SEED_COLLECT} rows to the driver (corpus/"
            f"{n_centroids_mod} grows with the corpus). Train centroids "
            "with operators/kmeans.kmeans_fit and pass model=(ids, "
            "vectors) — see the x_ann_ivf_trained suite entry."
        )
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    Cq = _np_quant(np.array([r["cvec"] for r in cent_rows], dtype=np.float64))
    return cids, Cq


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids_mod: int = 32,
    n_probes: int = 2,
    model=None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    ``model``: optional trained quantizer ``(cids, C_scaled)`` as
    returned by ``operators.kmeans.kmeans_fit`` — centroid ids plus the
    QUANT_SCALE-scaled centroid matrix. When given, it replaces the
    deterministic id-sample seeding below; the probing plan is
    unchanged.

    Coarse quantizer: a deterministic sample of corpus vectors acts as
    centroids (every ``n_centroids_mod``-th id — reproducible without a
    trained model; swap in k-means centroids at deployment, the plan is
    unchanged). The centroid table IS the model: it is collected to the
    driver (documented collect, bounded at |corpus|/n_centroids_mod
    rows — a trained quantizer would be loaded the same way) and
    broadcast to executors. The probe QUERIES are likewise driver-side —
    in a real search API they arrive at the driver; their n_probes
    nearest centroids are picked locally at zero Spark cost.

    Everything distance-related uses the QUANTIZED cosine
    (``QUANT_SCALE``): exact-integer dots and norms make every score
    bit-identical across numpy/BLAS, the JVM, and DuckDB regardless of
    summation order — the oracle replays the whole pipeline verbatim
    with no float hazards.

    Execution is ONE narrow Arrow stage over the corpus (mapInPandas —
    the one place in this module where the DataFrame API expresses the
    semantics but not the performance: higher-order functions are
    CodegenFallback, interpreted per row, ~8x slower than vectorized
    batch math; an expression-unrolled GetArrayItem chain is slower
    still). Each batch assigns its rows to centroids (BLAS matmul
    against the broadcast model), keeps only rows landing in a probed
    centroid, and emits (query_id, cand_id, cosine) directly — no join
    stage, no broadcast job. Only the ~n_probes/|cents| matched
    candidates leave the stage, into one tiny top-k window shuffle.

    At 100 TB you would persist the inverted lists (partitioned by
    centroid_id) once and let query batches prune to their probed
    partitions; the per-batch scoring kernel is unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    # centroid seeding is `id % n_centroids_mod` and probe_map keys on
    # int(cid): this operator structurally requires an integral id column
    # (unlike lsh_ann_topk / embed_near_dup_pairs, which are id-agnostic)
    id_kind = corpus.schema[id_col].dataType.typeName()
    if id_kind not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"ivf_ann_topk requires an integral {id_col!r} (centroids are "
            f"seeded by id % {n_centroids_mod}); got {id_kind}"
        )
    if model is not None:
        cids, Cq = np.asarray(model[0], dtype=np.int64), np.asarray(model[1], dtype=np.float64)
    else:
        cids, Cq = _seed_centroids(corpus, id_col, vec_col, n_centroids_mod, "ivf_ann_topk")
    cnorms = np.sqrt((Cq * Cq).sum(axis=1))
    n_probes_eff = min(n_probes, len(cids))

    q_rows = _collect_queries(
        queries, id_col, vec_col, "ivf_ann_topk", "ivf_ann_topk_probe_table"
    )
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Qq = _np_quant(np.array([r["q_vec"] for r in q_rows], dtype=np.float64)) if q_rows else np.zeros((0, 1))
    qnorms = np.sqrt((Qq * Qq).sum(axis=1))
    # probe map: centroid_id -> query indexes probing that list
    probe_map: dict[int, list[int]] = {}
    if q_rows:
        r_cos = _np_quant_cos_pre(Qq, Cq, qnorms, cnorms)
        # stable sort on -cos keeps cid-ascending order among ties
        order = np.argsort(-r_cos, axis=1, kind="stable")[:, :n_probes_eff]
        for qi in range(len(q_rows)):
            for j in order[qi]:
                probe_map.setdefault(int(cids[j]), []).append(qi)

    bc = spark.sparkContext.broadcast((cids, Cq, cnorms, qids, Qq, qnorms, probe_map))
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("cand_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score_batches(batches):
        cids_, Cq_, cn_, qids_, Qq_, qn_, pm_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Xq = _np_quant(np.stack(pdf["c_vec"].to_numpy()).astype(np.float64))
            xnorm = np.sqrt((Xq * Xq).sum(axis=1))
            cos_mat = (Xq @ Cq_.T) / (xnorm[:, None] * cn_[None, :])
            # argmax returns the FIRST max; centroids are cid-sorted, so
            # exact ties break to the lowest cid (matches the oracle)
            assigned = cids_[np.argmax(cos_mat, axis=1)]
            ids = pdf["cand_id"].to_numpy()
            out_q, out_c, out_s = [], [], []
            for cid, q_idxs in pm_.items():
                rows = np.nonzero(assigned == cid)[0]
                if rows.size == 0:
                    continue
                for qi in q_idxs:
                    cos = (Xq[rows] @ Qq_[qi]) / (xnorm[rows] * qn_[qi])
                    keep = ids[rows] != qids_[qi]
                    out_q.append(np.full(keep.sum(), qids_[qi]))
                    out_c.append(ids[rows][keep])
                    # ROUND(x, 6) half away from zero, as both SQL engines do
                    c6 = cos[keep]
                    out_s.append(np.sign(c6) * np.floor(np.abs(c6) * 1e6 + 0.5) / 1e6)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    pair_scored = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    ).mapInPandas(score_batches, out_schema)
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pair_scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _pair_score_cogroup_fn():
    """Build the cogroup scoring kernel shared by the probe-table ANN
    paths: given (candidates, probes) pandas frames for one co-located
    group (an IVF inverted list or an LSH bucket), block-matmul the
    quantized cosine of every (probe, candidate) pair, drop self-matches,
    and emit rounded scores. All arithmetic is quantized-exact
    (``QUANT_SCALE``), so the DuckDB oracle replays it bit-for-bit."""
    import numpy as np
    import pandas as pd

    empty = {
        "query_id": np.array([], dtype=object),
        "cand_id": np.array([], dtype=object),
        "cosine": np.array([], dtype=np.float64),
    }

    def score(cands: pd.DataFrame, probes: pd.DataFrame) -> pd.DataFrame:
        if len(cands) == 0 or len(probes) == 0:
            return pd.DataFrame(empty)
        Xq = _np_quant(np.stack(cands["_vec"].to_numpy()).astype(np.float64))
        Qq = _np_quant(np.stack(probes["_vec"].to_numpy()).astype(np.float64))
        xn = np.sqrt((Xq * Xq).sum(axis=1))
        qn = np.sqrt((Qq * Qq).sum(axis=1))
        C = (Qq @ Xq.T) / np.outer(qn, xn)
        # ROUND(x, 6) half away from zero, as both SQL engines do
        C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
        qids = probes["query_id"].to_numpy()
        cids = cands["cand_id"].to_numpy()
        qi, ci = np.meshgrid(
            np.arange(len(qids)), np.arange(len(cids)), indexing="ij"
        )
        qi, ci = qi.ravel(), ci.ravel()
        keep = qids[qi] != cids[ci]
        return pd.DataFrame(
            {
                "query_id": qids[qi[keep]],
                "cand_id": cids[ci[keep]],
                "cosine": C[qi[keep], ci[keep]],
            }
        )

    return score


def _ivf_model(corpus, id_col, vec_col, n_centroids_mod, model, caller):
    """Resolve the frozen coarse-quantizer model: ``model`` as given
    (trained k-means or a loaded index model), else the deterministic
    id-sample seeding. Returns (cids, Cq, cnorms) ready to broadcast —
    KB-scale, the only thing these paths ever collect."""
    import numpy as np

    id_kind = corpus.schema[id_col].dataType.typeName()
    if id_kind not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"{caller} requires an integral {id_col!r} (centroids are "
            f"seeded by id % {n_centroids_mod}); got {id_kind}"
        )
    if model is not None:
        cids = np.asarray(model[0], dtype=np.int64)
        Cq = np.asarray(model[1], dtype=np.float64)
    else:
        cids, Cq = _seed_centroids(corpus, id_col, vec_col, n_centroids_mod, caller)
    return cids, Cq, np.sqrt((Cq * Cq).sum(axis=1))


def ivf_build_lists(
    corpus: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF INDEX BUILD: one narrow Arrow pass assigns every corpus row
    to its nearest centroid under the FROZEN broadcast ``model``
    (cids, Cq — e.g. from ``kmeans.kmeans_fit`` or ``_seed_centroids``)
    and emits the inverted-list rows (centroid_id, cand_id, _vec).
    This frame IS the serving index: store it partitioned by
    centroid_id (Warehouse.write / write_staged) and probe batches
    prune to their probed lists. Assignment is per-vector against a
    frozen model, so appending a new batch's lists to a stored index
    is EXACTLY equivalent to a full rebuild — the invariant
    ``ivf_incremental_topk`` serves under and tests pin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cids, Cq, cnorms = model if len(model) == 3 else (*model, None)
    if cnorms is None:
        cnorms = np.sqrt((Cq * Cq).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast((cids, Cq, cnorms))
    id_type = corpus.schema[id_col].dataType
    vec_type = corpus.schema[vec_col].dataType
    cand_schema = T.StructType(
        [
            T.StructField("centroid_id", T.LongType()),
            T.StructField("cand_id", id_type),
            T.StructField("_vec", vec_type),
        ]
    )

    def assign_corpus(batches):
        cids_, Cq_, cn_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Xq = _np_quant(np.stack(pdf["_vec"].to_numpy()).astype(np.float64))
            xn = np.sqrt((Xq * Xq).sum(axis=1))
            cos = (Xq @ Cq_.T) / (xn[:, None] * cn_[None, :])
            # argmax returns the FIRST max; centroids are cid-sorted, so
            # exact ties break to the lowest cid (matches the oracle)
            yield pd.DataFrame(
                {
                    "centroid_id": cids_[np.argmax(cos, axis=1)],
                    "cand_id": pdf["cand_id"].to_numpy(),
                    "_vec": pdf["_vec"].to_numpy(),
                }
            )

    return corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(assign_corpus, cand_schema)


def ivf_probe_lists_topk(
    lists: DataFrame,
    queries: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probes: int = 2,
) -> DataFrame:
    """IVF SERVING over pre-built inverted ``lists`` (centroid_id,
    cand_id, _vec — from ``ivf_build_lists`` or a stored index table):
    one Arrow stage fans each probe out to its ``n_probes`` nearest
    centroids under the same frozen model, both sides co-shuffle ONCE
    on centroid_id, and the cogroup kernel block-matmuls each list
    against exactly the probes that probe it. When ``lists`` is a
    stored table partitioned by centroid_id, the probed lists prune at
    the scan."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cids, Cq, cnorms = model if len(model) == 3 else (*model, None)
    if cnorms is None:
        cnorms = np.sqrt((Cq * Cq).sum(axis=1))
    n_probes_eff = min(n_probes, len(cids))
    bc = queries.sparkSession.sparkContext.broadcast((cids, Cq, cnorms))
    probe_schema = T.StructType(
        [
            T.StructField("centroid_id", T.LongType()),
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("_vec", queries.schema[vec_col].dataType),
        ]
    )

    def assign_probes(batches):
        cids_, Cq_, cn_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Qq = _np_quant(np.stack(pdf["_vec"].to_numpy()).astype(np.float64))
            qn = np.sqrt((Qq * Qq).sum(axis=1))
            cos = (Qq @ Cq_.T) / (qn[:, None] * cn_[None, :])
            # stable sort on -cos keeps cid-ascending order among ties
            order = np.argsort(-cos, axis=1, kind="stable")[:, :n_probes_eff]
            n = len(pdf)
            idx = np.repeat(np.arange(n), n_probes_eff)
            yield pd.DataFrame(
                {
                    "centroid_id": cids_[order.ravel()],
                    "query_id": pdf["query_id"].to_numpy()[idx],
                    "_vec": pdf["_vec"].to_numpy()[idx],
                }
            )

    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(assign_probes, probe_schema)

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("cand_id", lists.schema["cand_id"].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    score = _pair_score_cogroup_fn()
    scored = (
        lists.groupBy("centroid_id")
        .cogroup(probes.groupBy("centroid_id"))
        .applyInPandas(score, out_schema)
    )
    # (query, cand) appears at most once: a candidate lives in exactly
    # one inverted list and a probe visits each list at most once — no
    # distinct needed before the top-k window.
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_ann_topk_probe_table(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids_mod: int = 32,
    n_probes: int = 2,
    model=None,
) -> DataFrame:
    """IVF top-k where the PROBE SIDE IS A DATAFRAME of arbitrary size —
    the serving path for batch/offline query tables. Unlike
    ``ivf_ann_topk`` (which collects a handful of driver-origin probe
    vectors), nothing data-sized touches the driver here: only the
    centroid MODEL is collected/broadcast (bounded at
    |corpus|/n_centroids_mod rows — KB-scale, same as loading a trained
    quantizer).

    Shape (see ``ivf_build_lists`` / ``ivf_probe_lists_topk``): one
    Arrow stage assigns each corpus row to its nearest centroid; a
    second Arrow stage fans each probe out to its ``n_probes`` nearest
    centroids; both sides then co-shuffle ONCE on ``centroid_id`` and a
    cogroup kernel block-matmuls each inverted list against exactly the
    probes that probe it. Shuffle volume is |corpus| + n_probes x
    |queries| vectors — pairs never ride a shuffle. Per-list work is
    |list| x |probes(list)|; a hot list is the residual skew risk (same
    mitigation as any skewed key: raise n_centroids_mod so lists
    shrink).

    Scores are quantized-exact (``QUANT_SCALE``) and the DuckDB oracle
    replays seeding, assignment, probing, and top-k bit-for-bit."""
    model3 = _ivf_model(
        corpus, id_col, vec_col, n_centroids_mod, model, "ivf_ann_topk_probe_table"
    )
    # the serving index is the memoized stored lists frame — repeat
    # probe batches over the same (corpus, frozen model) read one build
    lists = ivf_lists_frame(corpus, model3, id_col, vec_col)
    return ivf_probe_lists_topk(
        lists, queries, model3, id_col, vec_col, k=k, n_probes=n_probes
    )


def ivf_incremental_topk(
    base: DataFrame,
    batch: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids_mod: int = 32,
    n_probes: int = 2,
    model=None,
) -> DataFrame:
    """INCREMENTAL IVF index maintenance — the nightly production mode
    for ANN serving (the x_hll_merge / x_dedup_incremental lifecycle
    pattern applied to the vector index): the expensive part at 100 TB
    is the index BUILD, so the stored inverted lists are never rebuilt
    from the full corpus. A NEW embedding batch is assigned against the
    FROZEN centroid model (the model must not drift, or old list
    placements go stale) and its list rows are APPENDED to the
    persisted index; probes then serve from stored + appended lists in
    one plan.

    Because assignment is per-vector against a frozen model, the merged
    index is EXACTLY the index a full rebuild would produce — probe
    results are bit-identical (pinned by
    tests/test_operators.py::test_ivf_incremental_*; the suite oracle
    replays the full-rebuild form for the same reason). Retraining the
    quantizer (kmeans_fit on base+batch) is the rebuild event, not the
    nightly path.

    The MERGED lists are ``_persist``-ed: after the append, the stored
    index table contains base + batch rows, and every probe batch
    serves from THAT table — persisting the merged frame (not just the
    base) is the in-memory model of the post-append stored table
    (Warehouse.write(partition_by=["centroid_id"]) + mode="append" for
    the batch — the on-disk lifecycle a pytest drives end-to-end).
    Without it the whole index assignment would recompute per probe
    batch."""
    from .dedup import _persist

    model3 = _ivf_model(
        base, id_col, vec_col, n_centroids_mod, model, "ivf_incremental_topk"
    )
    # the BASE lists are the stored index (memoized — repeat appends
    # over the same stored index read one build); only the NEW batch is
    # assigned fresh, which is the append's real cost at scale
    merged = _persist(
        ivf_lists_frame(base, model3, id_col, vec_col).unionByName(
            ivf_build_lists(batch, model3, id_col, vec_col)
        )
    )
    return ivf_probe_lists_topk(
        merged, queries, model3, id_col, vec_col, k=k, n_probes=n_probes
    )


def lsh_planes_for(corpus_rows: int, target_bucket_rows: int = 4096) -> int:
    """The LSH scale lever as code: n_planes sized so the expected
    bucket holds ~``target_bucket_rows`` vectors (buckets per table =
    2^n_planes). Per-bucket serving cost is probes_in_bucket x
    cands_in_bucket — at FIXED planes that grows quadratically with the
    corpus (measured 10x data -> ~19x time at n_planes=4); holding
    bucket size constant keeps cost-per-probe flat and recall is tuned
    back with n_tables. Clamped to [1, 62] (bucket ids pack into a
    signed long)."""
    import math

    if corpus_rows <= 0 or target_bucket_rows <= 0:
        raise ValueError("lsh_planes_for: row counts must be positive")
    return max(1, min(62, math.ceil(math.log2(max(2, corpus_rows / target_bucket_rows)))))


def lsh_ann_topk_probe_table(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    prune_to_probed: bool = False,
    probe_pred=None,
) -> DataFrame:
    """LSH ANN top-k with a DataFrame probe side of arbitrary size — the
    serving path when queries arrive as a table, not a handful of
    driver-origin vectors. Nothing data-sized is collected: the only
    broadcast is the ±1 sign matrix (n_tables x n_planes x dim literals).

    Shape: both sides run the same one-pass Arrow bucket assignment
    (vectors ride along), co-shuffle ONCE on (tbl, bucket), and a
    cogroup kernel scores each bucket's probes against its candidates.
    A pair colliding in several tables is emitted per collision with an
    identical quantized-exact score, so a global DISTINCT dedupes it
    safely before the top-k window — the same invariant
    ``embedding_near_dup_pairs_lsh`` relies on.

    SCALE LEVER — ``n_planes`` must grow with the corpus: a table has
    2^n_planes buckets, so at FIXED planes the expected bucket size is
    n/2^n_planes and per-bucket probe x candidate scoring is O(n^2) in
    corpus size (measured: 10x data -> ~19x time at n_planes=4). Size
    n_planes ~ log2(n / target_bucket_rows) to hold bucket volume —
    and therefore cost per probe — constant; recall is then tuned back
    with ``n_tables``. The suite entry sizes n_planes from the corpus
    row count (``lsh_planes_for``, parquet-footer stat) and pins the
    resulting plane LITERALS per sf, so the oracle replays exactly at
    every scale.

    ``prune_to_probed``: when the probe side is BOUNDED by construction
    (a recall-audit panel, a held-out eval set), set True — the corpus
    bucket stream is pre-filtered map-side by a broadcast semi join on
    the probed (tbl, bucket) keys, so corpus rows in never-probed
    buckets don't ride the cogroup shuffle at all. At a fixed probe
    panel that turns the scan's shuffle volume from corpus-sized into
    probed-neighborhood-sized. Leave False when probes cover the key
    space (a table-sized probe side) — the semi join would only add
    work.

    ``probe_pred``: when the probe table is an INDEXED SUBSET of the
    corpus (a standing serving panel drawn from the same embeddings
    table), pass a boolean Column over the index frame's ``cand_id``
    instead of a ``queries`` frame — the probes' bucket rows are read
    straight out of the memoized stored index (``lsh_index_frame``) and
    a single (tbl, bucket) groupBy splits probes from candidates inside
    the flagged kernel: ONE exchange instead of the cogroup's two, and
    the probe side's whole Arrow re-hash stage disappears (its hashes
    already exist in the index). Bit-identical results by construction
    — hashing is per-vector under frozen planes and the kernel math is
    the same. A truly held-out probe table still takes the ``queries``
    frame and the cogroup. Exactly one of ``queries`` / ``probe_pred``
    must be given."""
    if (queries is None) == (probe_pred is None):
        raise ValueError(
            "lsh_ann_topk_probe_table: pass exactly one of queries / probe_pred"
        )
    if probe_pred is not None and prune_to_probed:
        raise ValueError(
            "lsh_ann_topk_probe_table: prune_to_probed applies only to the "
            "queries cogroup path — the probe_pred path already reads probes "
            "out of the stored index (there is no probe-side scan to prune)"
        )
    if probe_pred is not None:
        buckets = lsh_index_frame(corpus, id_col, vec_col, n_tables, n_planes, dim)
        return _lsh_topk(_lsh_flagged_scores(buckets, probe_pred), k)
    scored = _lsh_scored_pairs(
        corpus, queries, id_col, vec_col, n_tables, n_planes, dim,
        prune_to_probed=prune_to_probed, dedup=False,
    )
    return _lsh_topk(scored, k)


def lsh_build_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    out_id: str = "cand_id",
) -> DataFrame:
    """LSH INDEX BUILD: one narrow Arrow pass hashes every vector into
    its bucket in each of the ``n_tables`` hash tables under the
    deterministic ±1 plane matrix (``_sign_matrix`` — a pure function of
    (n_tables, n_planes, dim), i.e. the planes are FROZEN by
    construction, the LSH analogue of the frozen IVF centroid model)
    and emits the index rows (tbl, bucket, ``out_id``, _vec).

    This frame IS the serving index: store it partitioned by ``tbl``
    (or (tbl, bucket-range) at scale) via Warehouse.write and probe
    batches prune to their probed buckets. Hashing is per-vector under
    frozen planes, so appending a new batch's bucket rows to a stored
    index is EXACTLY equivalent to a full rebuild — the invariant
    ``lsh_incremental_topk`` serves under and tests pin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    S = _sign_matrix(n_tables, n_planes, dim)
    bc = df.sparkSession.sparkContext.broadcast(S)
    schema = T.StructType(
        [
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
            T.StructField(out_id, df.schema[id_col].dataType),
            T.StructField("_vec", df.schema[vec_col].dataType),
        ]
    )

    def assign(batches):
        S_ = bc.value
        tbls = np.arange(n_tables, dtype=np.int32)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            B = _np_bucket_ids(V, S_, n_tables, n_planes)
            n = len(pdf)
            idx = np.repeat(np.arange(n), n_tables)
            yield pd.DataFrame(
                {
                    "tbl": np.tile(tbls, n),
                    "bucket": B.ravel(),
                    out_id: pdf[out_id].to_numpy()[idx],
                    "_vec": pdf["_vec"].to_numpy()[idx],
                }
            )

    return df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias("_vec")
    ).mapInPandas(assign, schema)


# (corpus-plan, params) -> persisted bucket-index memo. A mapInPandas
# plan embeds a FRESH Python closure per construction, so two
# invocations of lsh_build_buckets over the same corpus NEVER
# cache-match in CacheManager (unlike pure-Column plans) — persisting
# per invocation just piles up non-deduped copies of a corpus-sized
# cache (measured: the recall audit's first run ballooned to 37 s under
# the eviction pressure). The memo keys on the INPUT plan's semantics +
# the index parameters and returns the same DataFrame object, which IS
# cache-hittable. LRU-capped via the shared dedup.PlanMemo (r12
# ADVICE: unbounded memos pay a sameSemantics py4j trip per stored
# entry per miss and pin plans for the process lifetime).
from .dedup import PlanMemo as _PlanMemo  # noqa: E402

_BUCKET_FRAMES = _PlanMemo()


def lsh_index_frame(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """``lsh_build_buckets`` as STORED state: persisted (the frame is
    the serving index — same lifecycle as the bloom words frame and the
    IVF centroid tables) and memoized by input-plan semantics so repeat
    constructions over the same corpus reuse one cached copy."""
    key = (id_col, vec_col, n_tables, n_planes, dim)
    hit = _BUCKET_FRAMES.get(df, key)
    if hit is not None:
        return hit
    return _BUCKET_FRAMES.put(
        df, key, lsh_build_buckets(df, id_col, vec_col, n_tables, n_planes, dim)
    )


def _model_digest(*arrays) -> str:
    """md5 over a frozen model's exact bytes (dtype + shape + data) —
    the model-identity component of a stored-index memo key.  Two equal
    models hash equal, so consumers share one stored build; a retrained
    or drifted model can never alias a stale index (the digest changes
    with any single centroid bit)."""
    import hashlib

    import numpy as np

    h = hashlib.md5()
    for a in arrays:
        a = np.ascontiguousarray(np.asarray(a))
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


# memoized stored inverted-list frames — the IVF serving index's
# stored-table lifecycle, exactly the _BUCKET_FRAMES argument: the
# assignment Arrow pass over the corpus is the index BUILD event, and
# every probe/serving invocation over the same (corpus, frozen model)
# reads the one materialized build.
_LIST_FRAMES = _PlanMemo()


def ivf_lists_frame(
    corpus: DataFrame,
    model3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_build_lists`` as STORED state: persisted and memoized by
    (corpus plan semantics, frozen-model digest)."""
    key = (id_col, vec_col, _model_digest(model3[0], model3[1]), "ivf_lists")
    hit = _LIST_FRAMES.get(corpus, key)
    if hit is not None:
        return hit
    return _LIST_FRAMES.put(
        corpus, key, ivf_build_lists(corpus, model3, id_col, vec_col)
    )


def _lsh_score_buckets(
    buckets: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_planes: int,
    dim: int,
    prune_to_probed: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """Probe stage over pre-built index ``buckets`` (tbl, bucket,
    cand_id, _vec — from ``lsh_build_buckets`` or a stored index
    table): bucket-assign the probes in one Arrow pass under the same
    frozen planes, co-shuffle once on (tbl, bucket), score each
    bucket's probes against its candidates via the cogroup kernel, and
    DISTINCT the multi-table collisions (quantized scores are identical
    across collisions, so the dedup is safe). Returns (query_id,
    cand_id, cosine) — consumers add top-k or threshold semantics.

    ``prune_to_probed``: broadcast-semi-join the index stream on the
    DISTINCT probed (tbl, bucket) keys before the cogroup exchange —
    rows in never-probed buckets are dropped MAP-SIDE and never
    shuffle. Only valid when the probe side is bounded by construction
    (the broadcast is |probes| x n_tables keys at most); it cannot
    change the result, because a bucket with no probe produces no
    pairs. The probe assignment runs twice under the flag (once for
    keys, once for the cogroup) — O(probes) Arrow work, the price of
    keeping corpus-sized data off the wire."""
    probes = lsh_build_buckets(
        queries, id_col, vec_col, n_tables, n_planes, dim, out_id="query_id"
    )
    if prune_to_probed:
        # the flag's contract is a BOUNDED probe side, and its probed
        # (tbl, bucket) keys are consumed by the semi join AND the
        # cogroup — checkpoint the (panel x n_tables)-row frame so the
        # probe Arrow stage runs once, not twice
        probes = probes.localCheckpoint(eager=False)
    return _lsh_score_prehashed(
        buckets,
        probes,
        queries.schema[id_col].dataType,
        prune_to_probed=prune_to_probed,
        dedup=dedup,
    )


def _lsh_score_prehashed(
    buckets: DataFrame,
    probes: DataFrame,
    qid_type,
    prune_to_probed: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """Score PRE-HASHED probe bucket rows (tbl, bucket, query_id, _vec)
    against the index — the serving tail of ``_lsh_score_buckets`` for
    callers whose probe bucket assignments already exist (e.g. the
    probe panel is an indexed subset, so its rows come straight out of
    the stored/persisted index instead of re-hashing through an extra
    Arrow stage)."""
    from pyspark.sql import types as T

    if prune_to_probed:
        probed_keys = probes.select("tbl", "bucket").distinct()
        buckets = buckets.join(
            F.broadcast(probed_keys), ["tbl", "bucket"], "left_semi"
        )
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type),
            T.StructField("cand_id", buckets.schema["cand_id"].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    score = _pair_score_cogroup_fn()
    scored = (
        buckets.groupBy("tbl", "bucket")
        .cogroup(probes.groupBy("tbl", "bucket"))
        .applyInPandas(score, out_schema)
    )
    # dedup=False: a top-k consumer folds the multi-table dedup into its
    # rank window (_lsh_topk) instead of paying a pair-sized exchange
    return scored.distinct() if dedup else scored


def _lsh_topk(scored_raw: DataFrame, k: int) -> DataFrame:
    """Top-k over RAW (collision-duplicated) scored pairs in ONE window
    pass: exact duplicates carry identical (cosine, cand_id) keys, so
    ``dense_rank`` assigns them one rank — dense_rank <= k over the raw
    stream equals row_number <= k over the deduped stream, and the
    leftover duplicate rows (at most n_tables x k per query) are
    dropped by a DISTINCT that is output-sized, not pair-sized. Saves
    the full pair-sized dedup exchange the old distinct-then-rank form
    paid; rank-function group-limit pushdown (WindowGroupLimit) applies
    to dense_rank the same as row_number."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored_raw.withColumn("rank", F.dense_rank().over(w))
        .filter(F.col("rank") <= k)
        .distinct()
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _pair_score_flagged_fn(probes_are_candidates: bool = True):
    """Single-frame variant of ``_pair_score_cogroup_fn`` for probe
    panels that are INDEXED SUBSETS: one group's rows carry an
    ``_is_probe`` flag, the kernel splits probes out and scores them
    against the group. Lets the serving plan pay ONE (tbl, bucket)
    exchange instead of the cogroup's two — the probe rows already ride
    the index stream. Same quantized-exact math and self-match drop as
    the cogroup kernel, bit-identical output.

    ``probes_are_candidates``: True (ANN serving — a probe is also a
    corpus member other probes may retrieve) scores probes against the
    WHOLE group; False (decontamination — eval examples must never be
    reported as contaminated corpus docs) scores probes against the
    non-probe rows only, matching the cogroup form whose corpus side
    excluded the eval set."""
    import numpy as np
    import pandas as pd

    empty = {
        "query_id": np.array([], dtype=object),
        "cand_id": np.array([], dtype=object),
        "cosine": np.array([], dtype=np.float64),
    }

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pr = pdf[pdf["_is_probe"]]
        if not probes_are_candidates:
            pdf = pdf[~pdf["_is_probe"]]
        if len(pdf) == 0 or len(pr) == 0:
            return pd.DataFrame(empty)
        Xq = _np_quant(np.stack(pdf["_vec"].to_numpy()).astype(np.float64))
        Qq = _np_quant(np.stack(pr["_vec"].to_numpy()).astype(np.float64))
        xn = np.sqrt((Xq * Xq).sum(axis=1))
        qn = np.sqrt((Qq * Qq).sum(axis=1))
        C = (Qq @ Xq.T) / np.outer(qn, xn)
        # ROUND(x, 6) half away from zero, as both SQL engines do
        C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
        qids = pr["cand_id"].to_numpy()
        cids = pdf["cand_id"].to_numpy()
        qi, ci = np.meshgrid(
            np.arange(len(qids)), np.arange(len(cids)), indexing="ij"
        )
        qi, ci = qi.ravel(), ci.ravel()
        keep = qids[qi] != cids[ci]
        return pd.DataFrame(
            {
                "query_id": qids[qi[keep]],
                "cand_id": cids[ci[keep]],
                "cosine": C[qi[keep], ci[keep]],
            }
        )

    return score


def _lsh_flagged_scores(
    buckets: DataFrame,
    probe_pred,
    probes_are_candidates: bool = True,
) -> DataFrame:
    """Score an INDEXED-SUBSET probe panel straight from the index
    stream (the CLAUDE.md indexed-subset probe rule shared by the
    incremental/decontaminate/probe-table entries): flag the panel's
    rows with ``probe_pred`` (a boolean Column over ``cand_id``), pay
    ONE (tbl, bucket) exchange, and let the flagged kernel split probes
    from candidates inside the group — no cogroup second exchange, no
    probe re-hash Arrow stage. Returns the raw per-collision
    (query_id, cand_id, cosine) stream; callers add top-k or threshold
    semantics (and the output-sized dedup — never a pair-sized one)."""
    from pyspark.sql import types as T

    id_type = buckets.schema["cand_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("cand_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    return (
        # coalesce: a NULL predicate result (nullable id column) must
        # mean "not a probe", not a NaN that breaks the kernel's
        # pandas boolean mask
        buckets.withColumn(
            "_is_probe",
            F.coalesce(probe_pred.cast("boolean"), F.lit(False)),
        )
        .groupBy("tbl", "bucket")
        .applyInPandas(
            _pair_score_flagged_fn(probes_are_candidates), out_schema
        )
    )


def _lsh_scored_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_planes: int,
    dim: int,
    prune_to_probed: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """Shared probe-table pair stage: read the corpus bucket index from
    the memoized STORED index (``lsh_index_frame`` — the serving-index
    lifecycle: every probe batch over the same corpus/params reads one
    persisted build instead of re-hashing the corpus per invocation)
    and score the probe table against it (``_lsh_score_buckets``)."""
    cands = lsh_index_frame(corpus, id_col, vec_col, n_tables, n_planes, dim)
    return _lsh_score_buckets(
        cands, queries, id_col, vec_col, n_tables, n_planes, dim,
        prune_to_probed=prune_to_probed,
        dedup=dedup,
    )


def lsh_probe_buckets_topk(
    buckets: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """LSH SERVING over a pre-built (possibly stored) bucket index:
    ``_lsh_score_buckets`` + the per-query top-k window. The
    (n_tables, n_planes, dim) parameters MUST match the build — they
    define the frozen plane matrix the probes are hashed under."""
    scored = _lsh_score_buckets(
        buckets, queries, id_col, vec_col, n_tables, n_planes, dim,
        dedup=False,
    )
    return _lsh_topk(scored, k)


def lsh_incremental_topk(
    base: DataFrame,
    batch: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    probe_pred=None,
) -> DataFrame:
    """INCREMENTAL LSH index maintenance — the ``ivf_incremental_topk``
    lifecycle applied to the hash-bucket index: the stored bucket rows
    are never rebuilt from the full corpus. A NEW embedding batch is
    hashed under the FROZEN plane matrix (deterministic in the index
    parameters, so it cannot drift) and its bucket rows are APPENDED to
    the persisted index; probes then serve from stored + appended
    buckets in one plan. Because hashing is per-vector, the merged
    index is EXACTLY the index a full rebuild would produce — probe
    results are bit-identical (pinned by
    tests/test_operators.py::test_lsh_incremental_*; the suite oracle
    replays the full-rebuild form for the same reason).

    The MERGED buckets are ``_persist``-ed: after the append, the
    stored index table contains base + batch rows and every probe batch
    serves from THAT table — persisting the merged frame models the
    post-append stored table (Warehouse.write(partition_by=["tbl"]) +
    mode="append" for the batch — the on-disk lifecycle a pytest drives
    end-to-end). Without it the whole index hashing would recompute per
    probe batch.

    ``probe_pred``: when the probe panel is an INDEXED SUBSET (a
    standing eval panel drawn from the corpus), pass a boolean Column
    over ``cand_id`` instead of a ``queries`` frame — the probe bucket
    rows are then read straight out of the persisted index (their
    hashes already exist; re-hashing the panel through a second Arrow
    stage is pure waste). Identical results by construction: hashing is
    per-vector under frozen planes. Exactly one of ``queries`` /
    ``probe_pred`` must be given."""
    from .dedup import _persist

    if (queries is None) == (probe_pred is None):
        raise ValueError(
            "lsh_incremental_topk: pass exactly one of queries / probe_pred"
        )
    # the BASE index is the stored table (lsh_index_frame — memoized by
    # corpus plan + params, so repeat appends over the same stored index
    # read one persisted build); only the NEW batch is hashed fresh,
    # which is the append's real cost at scale
    merged = _persist(
        lsh_index_frame(base, id_col, vec_col, n_tables, n_planes, dim)
        .unionByName(
            lsh_build_buckets(batch, id_col, vec_col, n_tables, n_planes, dim)
        )
    )
    if probe_pred is not None:
        # probes are index rows, so the probe side needn't ride its own
        # exchange at all: flag them and let a SINGLE (tbl, bucket)
        # groupBy split probes from candidates inside the kernel — one
        # exchange instead of the cogroup's two, bit-identical scores
        return _lsh_topk(_lsh_flagged_scores(merged, probe_pred), k)
    return lsh_probe_buckets_topk(
        merged, queries, id_col, vec_col, k, n_tables, n_planes, dim
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    eval_pred=None,
) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space companion to
    ``text.decontaminate``'s n-gram scan: flag corpus documents whose
    embedding sits within ``threshold`` cosine of ANY held-out eval
    example. Paraphrased or translated eval leakage shares no 8-gram
    with the eval set (the n-gram scan misses it) but lands next to it
    in embedding space — every serious eval-hygiene pass runs both.

    Output: one row per FLAGGED corpus doc — (id, n_eval_hits,
    max_cosine). Drop or quarantine the flagged ids; unflagged docs
    don't appear (the common case — keep the output contamination-
    sized, not corpus-sized).

    Shape: the shared LSH probe-table stage (one Arrow bucket pass per
    side, one (tbl, bucket) co-shuffle, cogroup scoring, quantized-
    exact scores) followed by a threshold filter and a cand-keyed
    aggregate. Nothing collects; the eval set rides as a DataFrame.
    Recall is the LSH recall — raise ``n_tables`` for a tighter sweep
    or run the exact ``cosine_topk`` on the (tiny) flagged closure.
    Same ``n_planes`` scale lever as ``lsh_ann_topk_probe_table``.

    The eval set is BOUNDED by construction (a held-out benchmark), so
    the index stream is pruned to the probed buckets map-side
    (``prune_to_probed``) — corpus rows nowhere near an eval example
    never ride the cogroup shuffle.

    ``eval_pred``: when the eval panel is an INDEXED SUBSET — a
    standing benchmark whose examples live in the same embeddings table
    as the corpus — pass ``corpus`` as the FULL table and a boolean
    Column over the index frame's ``cand_id`` instead of ``eval_set``:
    the panel's bucket rows are read straight out of the one bucket
    pass and a single (tbl, bucket) groupBy splits eval from corpus
    inside the kernel (``probes_are_candidates=False`` — eval examples
    are never reported as contaminated docs, matching the two-frame
    form whose corpus excluded them). One exchange instead of the
    cogroup's two and no second Arrow hash stage; scores bit-identical
    by construction. The index rows come from ``lsh_index_frame`` — the
    memoized persisted STORED index (the repo's index-lifecycle rule:
    decontamination probes the same serving index the recall audit
    audits; rebuilding the bucket pass per decontamination run
    mis-models the lifecycle and pays a corpus Arrow hash every
    invocation). A truly HELD-OUT eval set (not in the table) still
    takes the two-frame cogroup path. Exactly one of ``eval_set`` /
    ``eval_pred`` must be given."""
    if (eval_set is None) == (eval_pred is None):
        raise ValueError(
            "semantic_decontaminate: pass exactly one of eval_set / eval_pred"
        )
    if eval_pred is not None:
        buckets = lsh_index_frame(
            corpus, id_col, vec_col, n_tables, n_planes, dim
        )
        scored = (
            _lsh_flagged_scores(
                buckets, eval_pred, probes_are_candidates=False
            )
            # a pair colliding in several tables has identical quantized
            # scores everywhere — dedup the contamination-sized remainder
            # AFTER the threshold filter, never the full pair stream
            .filter(F.col("cosine") >= threshold)
            .distinct()
        )
    else:
        scored = _lsh_scored_pairs(
            corpus, eval_set, id_col, vec_col, n_tables, n_planes, dim,
            prune_to_probed=True,
        ).filter(F.col("cosine") >= threshold)
    return (
        scored
        .groupBy("cand_id")
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("cosine").alias("max_cosine"),
        )
        .select(F.col("cand_id").alias(id_col), "n_eval_hits", "max_cosine")
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
    """Embedding near-dup pairs at scale: candidates share an LSH
    (table, bucket); quantized cosine verifies candidates only — never
    all-pairs across the corpus.

    Shape: ONE Arrow bucket-assignment stage (vectors ride along), one
    shuffle on (tbl, bucket), then per-bucket vectorized all-pairs
    scoring via ``applyInPandas`` and a global DISTINCT (a pair can
    collide in several tables; its quantized cosine is identical
    everywhere, so exact dedup is safe). Per-bucket work is O(|bucket|²)
    — n_planes controls expected bucket size (|C|/2^planes per table);
    raise it for denser corpora. The DuckDB oracle replays bucket
    assignment, pairing, and scoring bit-for-bit (exact-integer
    quantized arithmetic, ``QUANT_SCALE``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_type = corpus.schema[id_col].dataType
    # the bucket rows come from the memoized STORED index
    # (lsh_index_frame — the same persisted build the serving and
    # decontamination entries read); re-running the corpus Arrow hash
    # pass per dedup invocation mis-models the index lifecycle. The
    # rename is a zero-cost projection over the cached frame.
    buckets = lsh_index_frame(
        corpus, id_col, vec_col, n_tables, n_planes, dim
    ).withColumnRenamed("cand_id", id_col)

    pair_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    # object dtype: ids keep their native Python values (int, str, ...)
    # and Arrow casts them to the declared id_type — no int64 assumption
    empty = {"id_a": np.array([], dtype=object),
             "id_b": np.array([], dtype=object),
             "cosine": np.array([], dtype=np.float64)}

    def bucket_pairs(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(empty)
        V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        Xq = _np_quant(V)
        xn = np.sqrt((Xq * Xq).sum(axis=1))
        C = (Xq @ Xq.T) / np.outer(xn, xn)
        # ROUND(x, 6) half away from zero, as both SQL engines do
        C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
        ia, ib = np.triu_indices(n, k=1)
        ids = pdf[id_col].to_numpy()
        a, b, cs = ids[ia], ids[ib], C[ia, ib]
        keep = cs >= threshold
        a, b, cs = a[keep], b[keep], cs[keep]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "cosine": cs}
        )

    return (
        buckets.groupBy("tbl", "bucket")
        .applyInPandas(bucket_pairs, pair_schema)
        .distinct()
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
    with the query in ANY of the ``n_tables`` hash tables; quantized
    cosine + window rank within candidates. With b planes/table and L
    tables a neighbor at angle θ is found w.p. 1-(1-(1-θ/π)^b)^L.

    Same execution shape as ``ivf_ann_topk``: query buckets are computed
    driver-side (probe queries are small and driver-origin); ONE narrow
    Arrow stage buckets each corpus batch (a single BLAS matmul against
    the broadcast ±1 sign matrix), masks rows colliding with any query
    bucket, scores only those, and emits (query_id, cand_id, cosine) —
    the bucket join replaces the |Q| x |C| cross product with per-bucket
    work (~|C| * L / 2^b candidates per query in expectation), and only
    those candidates reach the final top-k window shuffle. All scores
    are quantized-exact (``QUANT_SCALE``), replayed verbatim by the
    DuckDB oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    S = _sign_matrix(n_tables, n_planes, dim)
    q_rows = _collect_queries(
        queries, id_col, vec_col, "lsh_ann_topk", "lsh_ann_topk_probe_table"
    )
    # object dtype keeps ids native (int, str, ...); the output schema
    # advertises the input id column's type, so no int64 coercion here
    qids = np.array([r["query_id"] for r in q_rows], dtype=object)
    Qq = _np_quant(np.array([r["q_vec"] for r in q_rows], dtype=np.float64)) if q_rows else np.zeros((0, dim))
    qnorms = np.sqrt((Qq * Qq).sum(axis=1))
    qbuckets = _np_bucket_ids(
        np.array([r["q_vec"] for r in q_rows], dtype=np.float64), S, n_tables, n_planes
    ) if q_rows else np.zeros((0, n_tables), dtype=np.int64)

    bc = spark.sparkContext.broadcast((S, qids, Qq, qnorms, qbuckets))
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("cand_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        S_, qids_, Qq_, qn_, qb_ = bc.value
        for pdf in batches:
            if len(pdf) == 0 or len(qids_) == 0:
                continue
            V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            Xq = _np_quant(V)
            xnorm = np.sqrt((Xq * Xq).sum(axis=1))
            B = _np_bucket_ids(V, S_, n_tables, n_planes)
            ids = pdf["cand_id"].to_numpy()
            out_q, out_c, out_s = [], [], []
            for qi in range(len(qids_)):
                # candidate iff the row shares qi's bucket in ANY table
                mask = (B == qb_[qi][None, :]).any(axis=1)
                mask &= ids != qids_[qi]
                rows = np.nonzero(mask)[0]
                if rows.size == 0:
                    continue
                cos = (Xq[rows] @ Qq_[qi]) / (xnorm[rows] * qn_[qi])
                out_q.append(np.full(rows.size, qids_[qi]))
                out_c.append(ids[rows])
                # ROUND(x, 6) half away from zero, as both SQL engines do
                out_s.append(np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine": np.concatenate(out_s),
                }
            )

    scored = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 32,
    n_iter: int = 3,
    threshold: float = 0.4,
    model=None,
):
    """SemDeDup-style semantic near-dup pairs: cluster the embedding
    space with the fixed-round quantized k-means
    (operators/kmeans.kmeans_fit), then score all pairs WITHIN each
    cluster and keep those at quantized cosine >= threshold — semantic
    duplicates (paraphrases, re-renderings) that exact/MinHash dedup
    cannot see. Clustering makes the quadratic local: k clusters cut
    candidate pairs from N^2/2 to ~N^2/(2k), and at 100 TB the
    per-cluster work is an embarrassingly parallel Arrow stage (one
    BLAS gram matrix per cluster batch).

    Pass ``model=(cids, C)`` from a prior ``kmeans_fit`` to skip
    refitting (the production shape: the quantizer is trained once and
    reused across dedup runs — same contract as ``ivf_ann_topk``).

    Shape: broadcast centroid model -> one narrow mapInPandas
    assignment pass, one key join to re-attach vectors, one shuffle on
    cluster_id, per-cluster vectorized scoring via applyInPandas.
    Quantized-exact arithmetic (``QUANT_SCALE``) end to end, so the
    DuckDB oracle (kmeans CTE replay + pairwise quantized cosine)
    matches bit-for-bit. Returns (cluster_id, id_a, id_b, cosine),
    id_a < id_b."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .kmeans import _assign_kernel, kmeans_fit

    spark = corpus.sparkSession
    if model is None:
        model = kmeans_fit(corpus, id_col, vec_col, seed_mod, n_iter)
    bc = spark.sparkContext.broadcast(model)
    id_type = corpus.schema[id_col].dataType
    asg_schema = T.StructType(
        [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("member_id", id_type),
        ]
    )
    src = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    asg = src.mapInPandas(_assign_kernel(bc, emit_sums=False), asg_schema)
    members = asg.join(
        corpus.select(
            F.col(id_col).alias("member_id"), F.col(vec_col).alias("_vec")
        ),
        "member_id",
    )
    pair_schema = T.StructType(
        [
            T.StructField("cluster_id", T.LongType()),
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = {
        "cluster_id": np.array([], dtype=np.int64),
        "id_a": np.array([], dtype=object),
        "id_b": np.array([], dtype=object),
        "cosine": np.array([], dtype=np.float64),
    }

    def cluster_pairs(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(empty)
        V = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        Xq = _np_quant(V)
        xn = np.sqrt((Xq * Xq).sum(axis=1))
        Cm = (Xq @ Xq.T) / np.outer(xn, xn)
        # ROUND(x, 6) half away from zero, as both SQL engines do
        Cm = np.sign(Cm) * np.floor(np.abs(Cm) * 1e6 + 0.5) / 1e6
        ia, ib = np.triu_indices(n, k=1)
        ids = pdf["member_id"].to_numpy()
        a, b, cs = ids[ia], ids[ib], Cm[ia, ib]
        keep = cs >= threshold
        a, b, cs = a[keep], b[keep], cs[keep]
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(a), pdf["cluster_id"].iloc[0]),
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine": cs,
            }
        )

    return members.groupBy("cluster_id").applyInPandas(cluster_pairs, pair_schema)


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-cosine-similar corpus vectors with a DIFFERENT label —
    the near-misses that make the loss informative. Same plan shape as
    cosine_topk (broadcast anchors, streamed corpus, per-anchor window
    top-k with WindowGroupLimit pushdown); the label filter runs before
    scoring so agreeing-label rows never pay the dot product."""
    q = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).alias("c_vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            F.round(cosine_expr("q_vec", "c_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "anchor_label", "cand_id", "cand_label", "cosine", "rank")
    )


def projection_signs(out_dim: int, dim: int):
    """±1 sparse-free sign matrix for random projection, md5-derived
    (namespace 'proj' — independent of the LSH planes). Pure literal
    data: the same matrix is embedded in the Spark kernel AND the
    DuckDB oracle, so the projection is engine-portable by
    construction."""
    return [
        [
            1 if hashlib.md5(f"proj:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for j in range(dim)
        ]
        for i in range(out_dim)
    ]


def random_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Signed random projection (Achlioptas ±1 variant): reduce
    ``dim``-d embeddings to ``out_dim`` components y_i = Σ_j s_ij x_j
    — the cheap JL-style dimensionality reduction a 100 TB pipeline
    runs before clustering / near-dup passes to cut vector bytes 4x.

    Exactness: inputs quantize to integers (QUANT_SCALE), the sign
    matrix is ±1, so every output is an exact integer in float64
    regardless of summation order — divided once by QUANT_SCALE into
    the emitted double. Output is EXPLODED to (id, out_i, component)
    rows: portable to hash-compare (array column reprs differ across
    engines) and the shape downstream bucketing wants anyway.

    Shape: ONE narrow Arrow stage (mapInPandas, broadcast 16x64 sign
    matrix, BLAS matmul per batch — higher-order functions are
    CodegenFallback and ~8x slower); no shuffle at all. At 100 TB this
    is a pure map over the corpus partitions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    S = np.array(projection_signs(out_dim, dim), dtype=np.float64)
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("out_i", T.IntegerType()),
            T.StructField("component", T.DoubleType()),
        ]
    )

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Xq = _np_quant(np.stack(pdf["_v"].to_numpy()).astype(np.float64))
            Y = Xq @ S.T  # exact integers < 2^26 * dim
            ids = pdf["_id"].to_numpy()
            n = len(ids)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, out_dim),
                    "out_i": np.tile(np.arange(out_dim, dtype=np.int32), n),
                    "component": Y.reshape(-1) / QUANT_SCALE,
                }
            )

    return df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(project, out_schema)


def random_project_oracle_sql(
    src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB replay of ``random_project``: same literal sign rows over
    the same quantized components — exact integer sums, one division."""
    qs = f"{int(QUANT_SCALE)}.0"
    signs = projection_signs(out_dim, dim)
    selects = []
    for i in range(out_dim):
        arr = "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in signs[i]) + "]"
        dot = (
            f"list_sum(list_transform(list_zip({vec_col}, {arr}),"
            f" z -> round(CAST(z[1] AS DOUBLE) * {qs}) * CAST(z[2] AS DOUBLE)))"
        )
        selects.append(
            f"SELECT {id_col}, {i} AS out_i,"
            f" CAST({dot} / {qs} AS DOUBLE) AS component FROM {src}"
        )
    return "(" + "\nUNION ALL\n".join(selects) + ")"


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit — the 4x storage
    cut a 100 TB embedding store takes before ANN indexing: scale =
    max|x_j|, q_j = round(x_j / scale * 127), and the summary a
    quantization rollout reviews per vector: the scale, the exact
    integer code sum (a cheap content fingerprint of the codes), and
    the worst reconstruction error max|x_j − q_j·scale/127|.

    Determinism: float components widen to double identically in both
    engines, every expression tree is spelled identically in the
    oracle, and round() is half-away-from-zero in both. Zero vectors
    quantize to all-zero codes (scale 0 guarded). Higher-order
    functions are acceptable here — per-element maps with no BLAS
    shape, output is one row per vector, and the op is audit-grade,
    not a scoring hot path (those use the broadcast-numpy kernels
    above).

    Shape: narrow single scan, no shuffle at any corpus size."""
    x = F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))")
    scale = F.array_max(F.expr(f"transform({vec_col}, v -> abs(CAST(v AS DOUBLE)))"))
    base = df.select(
        F.col(id_col), x.alias("_x"), scale.alias("scale")
    )
    q = F.expr(
        "CASE WHEN scale = 0 THEN transform(_x, v -> CAST(0 AS BIGINT)) "
        "ELSE transform(_x, v -> CAST(round(v / scale * 127) AS BIGINT)) END"
    )
    withq = base.withColumn("_q", q)
    recon_err = F.expr(
        "CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "array_max(zip_with(_x, _q, (v, c) -> abs(v - c * scale / 127))) END"
    )
    return withq.select(
        id_col,
        F.size("_x").alias("n_dims"),
        F.col("scale"),
        F.expr(
            "aggregate(_q, CAST(0 AS BIGINT), (a, c) -> a + c)"
        ).alias("sum_q"),
        F.round(recon_err, 9).alias("max_abs_err"),
    )


def centroid_drift(
    df: DataFrame, vec_col: str, slice_col, scale: int = int(QUANT_SCALE)
) -> DataFrame:
    """Embedding-space drift between two corpus slices: the cosine
    between the slices' centroid vectors — the numeric complement of
    the lexical/KS drift gates (a new crawl snapshot whose embedding
    centroid swings away from the reference slice changes the training
    distribution even when token stats look stable).

    Exactness: components quantize to the ``scale`` grid (half-up,
    exact float→double product), per-dim sums are exact bigints, the
    per-dim MEAN re-lands on the quantized grid via a shift-then-
    truncate division (numerator made nonnegative first, so Spark's
    ``div`` and DuckDB's ``//`` agree), and dot/norms over the d-entry
    mean vectors are exact bigints (bounded by d·(2·scale)² — 2^44 for
    d=64 at the default grid, independent of corpus size). One IEEE
    division + sqrt at the end; the oracle replays bit-for-bit at ANY
    row count (sums stay exact while n·scale < 2^63 — ~3·10^13 rows).

    Shape: ``spread_input`` then ONE posexplode + grouped partial-agg
    pass — the d× row expansion collapses to the (2·d)-row grid inside
    the map stage (map-side combine), so the exchange carries ~2·d
    rows regardless of corpus size; everything after is grid-sized.

    ``slice_col``: boolean Column; False = slice a, True = slice b.
    Output (1 row): n_a, n_b, n_dims, dot_q, centroid_cosine."""
    from .dedup import spread_input

    e = spread_input(df.select(slice_col.cast("boolean").alias("_sb"), vec_col))
    exploded = e.select(
        "_sb", F.posexplode(vec_col).alias("_pos", "_x")
    ).select(
        "_sb",
        (F.col("_pos") + 1).alias("dim"),
        F.round(F.col("_x").cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("_q"),
    )
    per = exploded.groupBy("_sb", "dim").agg(
        F.sum("_q").alias("_s"), F.count("*").alias("_n")
    )
    m = per.select(
        "_sb",
        "dim",
        "_n",
        F.expr(f"((_s + _n * {scale}L) div _n) - {scale}L").alias("_m"),
    )
    a = m.filter(~F.col("_sb")).select(
        "dim", F.col("_m").alias("_ma"), F.col("_n").alias("_na")
    )
    b = m.filter(F.col("_sb")).select(
        "dim", F.col("_m").alias("_mb"), F.col("_n").alias("_nb")
    )
    j = a.join(b, "dim")
    return (
        j.agg(
            F.min("_na").alias("n_a"),
            F.min("_nb").alias("n_b"),
            F.count("*").cast("int").alias("n_dims"),
            F.sum(F.col("_ma") * F.col("_mb")).alias("dot_q"),
            F.sum(F.col("_ma") * F.col("_ma")).alias("_aa"),
            F.sum(F.col("_mb") * F.col("_mb")).alias("_bb"),
        )
        .select(
            "n_a",
            "n_b",
            "n_dims",
            "dot_q",
            F.when(
                (F.col("_aa") > 0) & (F.col("_bb") > 0),
                F.round(
                    F.col("dot_q").cast("double")
                    / F.sqrt(
                        F.col("_aa").cast("double") * F.col("_bb").cast("double")
                    ),
                    6,
                ),
            ).alias("centroid_cosine"),  # NULL when a centroid is zero
        )
    )


def ann_recall_audit(
    corpus: DataFrame,
    probes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    probe_pred=None,
) -> DataFrame:
    """ANN quality measurement — recall@k of the LSH probe-table path
    against the exact brute-force ground truth, per probe. This is the
    number that DECIDES n_tables/n_planes before anyone trusts the
    approximate index at 100 TB: tuning blind is how silent recall
    collapse ships. Run it on a small fixed probe panel per ingest
    batch and alert on drops (the same discipline as the drift gates).

    Output: (query_id, n_exact, n_hits, recall_ppm) where recall_ppm =
    (hits·10⁶) div |exact top-k| — exact integers, engine-identical;
    both sides use deterministic (score DESC, id) tie-breaks, so the
    id sets — and therefore the audit — replay bit-for-bit.

    Shape: the exact side broadcasts the (constant-size) probe panel
    over one corpus stream + a WindowGroupLimit top-k; the approximate
    side is the shared LSH probe-table stage with the index stream
    pruned to the panel's probed buckets (``prune_to_probed`` — the
    panel is constant-size, so the probed-keys broadcast is bounded);
    the comparison is a semi join at top-k volume. Keep the panel
    fixed-size (it rides a broadcast nested-loop by design); the
    corpus side scales freely.

    ``probe_pred``: when the panel is an INDEXED SUBSET of the corpus
    (the standing-panel production mode), pass a boolean Column over
    ``id_col`` instead of a ``probes`` frame — the audited bucket index
    is then built ONCE and ``_persist``-ed (it IS the stored index
    being audited; rebuilding it per audit run mis-models the
    lifecycle), the probe bucket rows are read straight out of it
    (flagged, no second Arrow hash stage), and the scoring pays ONE
    (tbl, bucket) exchange via the flagged kernel instead of the
    cogroup's two — the CLAUDE.md indexed-subset probe rule. Results
    are bit-identical to the cogroup path by construction (hashing is
    per-vector under frozen planes; same quantized kernel). Exactly
    one of ``probes`` / ``probe_pred`` must be given; a truly HELD-OUT
    panel still takes the ``probes`` frame and the cogroup."""
    if (probes is None) == (probe_pred is None):
        raise ValueError(
            "ann_recall_audit: pass exactly one of probes / probe_pred"
        )
    if probe_pred is not None:
        probes = corpus.filter(probe_pred)
    # exact feeds BOTH the hit semi join and the per-query n_exact
    # denominator — checkpoint so the brute-force scan runs once
    # (CLAUDE.md intra-query-sharing rule)
    exact = (
        cosine_topk(corpus, probes, id_col, vec_col, k)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=False)
    )
    if probe_pred is not None:
        from pyspark.sql import types as T

        buckets = lsh_index_frame(
            corpus, id_col, vec_col, n_tables, n_planes, dim
        )
        # probed (tbl, bucket) keys from the panel's own index rows —
        # one tiny Arrow stage over the filtered panel scan, the price
        # of dropping never-probed buckets map-side before the exchange
        probe_keys = (
            lsh_build_buckets(
                probes, id_col, vec_col, n_tables, n_planes, dim
            )
            .select("tbl", "bucket")
            .distinct()
        )
        id_type = buckets.schema["cand_id"].dataType
        out_schema = T.StructType(
            [
                T.StructField("query_id", id_type),
                T.StructField("cand_id", id_type),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        flagged = (
            # probe_pred is written over ``id_col`` (it also filters the
            # corpus for the exact side); the index frame carries the id
            # as cand_id — rename around the flag so ONE predicate
            # serves both frames
            buckets.withColumnRenamed("cand_id", id_col)
            .withColumn(
                "_is_probe",
                # coalesce: NULL predicate (nullable id) means "not a
                # probe", never a NaN in the kernel's pandas mask
                F.coalesce(probe_pred.cast("boolean"), F.lit(False)),
            )
            .withColumnRenamed(id_col, "cand_id")
            .join(F.broadcast(probe_keys), ["tbl", "bucket"], "left_semi")
        )
        scored = flagged.groupBy("tbl", "bucket").applyInPandas(
            _pair_score_flagged_fn(), out_schema
        )
        approx = _lsh_topk(scored, k).select("query_id", "cand_id")
    else:
        approx = lsh_ann_topk_probe_table(
            corpus, probes, id_col, vec_col, k, n_tables, n_planes, dim,
            prune_to_probed=True,
        ).select("query_id", "cand_id")
    hits = exact.join(approx, ["query_id", "cand_id"], "left_semi")
    n_exact = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    n_hits = hits.groupBy("query_id").agg(F.count("*").alias("n_hits"))
    return (
        n_exact.join(n_hits, "query_id", "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            F.expr("(n_hits * 1000000) div n_exact").alias("recall_ppm"),
        )
    )
