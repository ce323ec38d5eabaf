"""Synthesize an sf1-scale corpus from the driver's sf0.1 parquet:
each fact-ish table is replicated REPLICAS times with disjoint key
offsets (10 x sf0.1 ~ sf1), so joins behave as independent copies and
group cardinalities scale linearly. nation/region stay single-copy
(replicated-table FKs are offset; dim FKs are not). Output is written
inside the repo (gitignored) because /root/testdata is read-only.

Usage: python tools/make_sf1.py [--out .bench_sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_dbt_finance_warehouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFFSET = 1_000_000_000

# key columns to shift per table (PKs + FKs to other replicated tables)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".bench_sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark("make_sf1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t in SINGLE:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: {df.count()} rows (single copy)")

    alpha = "abcdefghijklmnopqrstuvwxyz"
    for t, keys in KEYS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        copies = []
        for i in range(args.replicas):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if t == "documents" and i > 0:
                # rotate the alphabet per replica: copies must NOT be
                # near-duplicates of each other, or dedup candidate
                # pairs grow quadratically in the replica count — an
                # artifact no real corpus has
                rot = alpha[i:] + alpha[:i]
                c = c.withColumn("text", F.translate("text", alpha, rot))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: {df.count()} -> {args.replicas}x")
    spark.stop()


if __name__ == "__main__":
    main()
