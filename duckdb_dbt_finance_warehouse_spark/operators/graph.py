"""Iterative graph algorithms (SURVEY §7.6) — the third house pattern
for fixed-round iteration after large-star/small-star connected
components (dedup_clusters) and quantized k-means (kmeans).

PageRank here is INTEGER-EXACT: ranks are scaled bigints, every
per-edge contribution is a floor division (``rank div out_degree``),
and the damping update is integer multiply + floor divide — no floats
anywhere until the final display column. Floor-div PageRank loses the
sub-integer remainder mass (and dangling-node mass — the standard
"lost mass" variant), which is fine for RANKING purposes and buys full
cross-engine determinism: DuckDB replays the identical ``//`` chain
bit-for-bit, something float PageRank (order-dependent sums) can never
do.

Scale: each round is one edges⋈ranks equi-join (both sides partitioned
on the src key) + one dst-keyed aggregation — the textbook distributed
PageRank round. The static edge+degree frame feeds every round, so it
is localCheckpointed; ranks chain from round to round. Unrolled fixed
rounds (like kmeans) keep the whole run one deterministic plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-round integer-exact PageRank over a directed edge list.

    Output: (node, rank_q, rank) — the scaled-int rank and its double
    display form. Nodes are everything appearing as a src or dst; a
    node with no in-edges keeps the base (teleport) term only.
    ``damping_pct`` is an integer percent so the update stays in
    integer arithmetic: r' = ((100-d)·scale div 100) div N
    + (d · Σ_in(r div out_deg)) div 100."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"pagerank: damping_pct must be in (0,100), got {damping_pct}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("od"))
    # the static per-round probe side: every edge with its src degree
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    n1 = nodes.agg(F.count("*").alias("n_nodes"))
    base = F.expr(f"(({100 - damping_pct} * {scale}) div 100) div n_nodes")
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"{scale} div n_nodes").alias("rq")
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rq div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    base
                    + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
                ).alias("rq"),
            )
        )
    return ranks.select(
        "node",
        F.col("rq").alias("rank_q"),
        (F.col("rq").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB replay: the identical floor-division chain, rounds
    unrolled as CTEs. ``edges_sql`` must select columns (src, dst)."""
    d = damping_pct
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT count(*) AS n_nodes FROM nodes)",
        "deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1)",
        f"r0 AS (SELECT node, {scale} // n_nodes AS rq FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst, CAST(SUM(r.rq // deg.od) AS BIGINT) AS s"
            f" FROM e JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN deg ON deg.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node,"
            f" ((({100 - d} * {scale}) // 100) // n_nodes)"
            f" + (({d} * coalesce(c{i}.s, 0)) // 100) AS rq"
            f" FROM nodes CROSS JOIN nn"
            f" LEFT JOIN c{i} ON c{i}.dst = nodes.node)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
    SELECT node, CAST(rq AS BIGINT) AS rank_q,
           CAST(rq AS DOUBLE) / {float(scale)} AS rank
    FROM r{iterations}
    """
    )
