"""Bucketed co-located joins — the 100 TB repeated-join strategy
(SURVEY §4): write both sides bucketed by the join key, and the join
plans with NO shuffle exchange on either side."""

from __future__ import annotations

import contextlib
import io

import pytest

from duckdb_dbt_finance_warehouse_spark.sources.tables import load_testdata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    import os

    wh = str(tmp_path_factory.mktemp("buckets"))
    t = load_testdata(spark, SF, "orders", "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # external bucketed tables (warehouse.dir is a static conf; an
    # explicit path keeps test artifacts in tmp)
    t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", os.path.join(wh, "b_orders")
    ).saveAsTable("b_orders")
    t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", os.path.join(wh, "b_lineitem")
    ).saveAsTable("b_lineitem")
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_incremental_dedup_index_as_bucketed_table(spark, tmp_path):
    """The x_dedup_incremental production layout: the standing MinHash
    index stored as a table BUCKETED by the band join key. The band
    join then shuffles ONLY the new batch (one Exchange, on the probe
    side); the stored index is read straight out of its buckets — the
    'index-lookup, not a scan' shape the operator docstring promises —
    and pairs match the plain unbucketed operator bit-for-bit."""
    import io
    import os
    from contextlib import redirect_stdout

    from duckdb_dbt_finance_warehouse_spark.operators import dedup
    from pyspark.sql import functions as F

    docs = load_testdata(spark, SF, "documents")["documents"]
    index_docs = docs.filter(F.col("doc_id") % 4 != 0)
    new_docs = docs.filter(F.col("doc_id") % 4 == 0)
    index_sigs = dedup.portable_signatures(index_docs, "doc_id", "text", k=5, n_hashes=64)
    index_bands = dedup.portable_bands(index_sigs, "doc_id", bands=16, n_hashes=64)

    wh = str(tmp_path)
    for name in ("idx_sigs", "idx_bands"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    index_sigs.write.option("path", os.path.join(wh, "idx_sigs")).saveAsTable("idx_sigs")
    index_bands.write.bucketBy(8, "band", "bkey").option(
        "path", os.path.join(wh, "idx_bands")
    ).saveAsTable("idx_bands")
    try:
        stored_sigs = spark.table("idx_sigs")
        stored_bands = spark.table("idx_bands")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            pairs, _, _ = dedup.minhash_lsh_dedup_incremental(
                new_docs, stored_sigs, stored_bands, "doc_id", "text",
                k=5, n_hashes=64, bands=16, threshold=0.5,
            )
            got = sorted(map(tuple, pairs.select("id_a", "id_b").collect()))
            # the index side of the band join must come straight from
            # its buckets: bucket metadata on the scan, and only ONE
            # exchange partitions on the band key — the new batch being
            # shuffled INTO the index's bucket layout (the other
            # exchange is the batch's own signature aggregation)
            nb = dedup.portable_bands(
                dedup.portable_signatures(
                    new_docs, "doc_id", "text", k=5, n_hashes=64
                ),
                "doc_id", bands=16, n_hashes=64,
            ).select(F.col("doc_id").alias("id_a"), "band", "bkey")
            probe_join = nb.join(stored_bands, ["band", "bkey"])
            buf = io.StringIO()
            with redirect_stdout(buf):
                probe_join.explain("formatted")
            plan = buf.getvalue()
            assert "Bucketed: true" in plan, plan
            assert plan.count("hashpartitioning(band") == 1, plan
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # parity with the in-memory operator
        mem_sigs = dedup.portable_signatures(
            index_docs, "doc_id", "text", k=5, n_hashes=64
        )
        mem_bands = dedup.portable_bands(mem_sigs, "doc_id", bands=16, n_hashes=64)
        ref_pairs, _, _ = dedup.minhash_lsh_dedup_incremental(
            new_docs, mem_sigs, mem_bands, "doc_id", "text",
            k=5, n_hashes=64, bands=16, threshold=0.5,
        )
        assert got == sorted(map(tuple, ref_pairs.select("id_a", "id_b").collect()))
        assert got  # non-degenerate: the fixture corpus has near-dups
    finally:
        for name in ("idx_sigs", "idx_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_compact_table_unpartitioned_and_partitioned(spark, tmp_path):
    """Small-file compaction: file count drops to the target, content is
    identical, partition layout survives, and sorted layout produces
    row-group stats usable for skipping."""
    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.sources.maintenance import (
        compact_table,
        data_files,
    )
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket_key"),
        (F.col("id") * 2).alias("val"),
    )
    # fragmented write: many small files
    wh.write(df.repartition(32), "mart", "flat")
    assert len(data_files(wh, "mart", "flat")) >= 32
    before = sorted(tuple(r) for r in wh.read("mart", "flat").collect())
    n = compact_table(wh, "mart", "flat", target_files=2, sort_within=["id"])
    assert n <= 2
    assert sorted(tuple(r) for r in wh.read("mart", "flat").collect()) == before

    wh.write(df.repartition(16), "mart", "parts", partition_by=["bucket_key"])
    frag = len(data_files(wh, "mart", "parts"))
    assert frag >= 16
    before_p = sorted(tuple(r) for r in wh.read("mart", "parts").collect())
    n = compact_table(wh, "mart", "parts", target_files=1)
    assert n == 4  # one file per partition value
    after_p = wh.read("mart", "parts")
    assert sorted(tuple(r) for r in after_p.collect()) == before_p
    # partition pruning still works on the compacted layout
    assert after_p.filter("bucket_key = '1'").count() == 2500


def test_compact_table_survives_shallow_partition_chain(spark, tmp_path):
    """ADVICE r7: the old partition-column discovery descended ONE
    arbitrary os.listdir chain, so a shallower-than-others partition
    directory (an empty, partially-written chain) could yield an
    incomplete column list and the rewrite silently FLATTENED the
    missing level. Discovery now rides Spark's own partition inference:
    plant an empty one-level decoy dir that sorts first and assert the
    two-level layout survives compaction intact."""
    import os

    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.sources.maintenance import compact_table
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(2_000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("lvl1"),
        (F.col("id") % 3).cast("string").alias("lvl2"),
    )
    wh.write(df.repartition(8), "mart", "deep", partition_by=["lvl1", "lvl2"])
    # the decoy: an empty lvl1 partition dir with NO lvl2 level below —
    # '=' in the name, sorts before 'lvl1=0' under os.listdir ordering
    os.makedirs(os.path.join(wh.path("mart", "deep"), "lvl1=!empty"))
    before = sorted(tuple(r) for r in wh.read("mart", "deep").collect())
    compact_table(wh, "mart", "deep", target_files=1)
    root = wh.path("mart", "deep")
    lvl1_dirs = [d for d in os.listdir(root) if d.startswith("lvl1=") and "!e" not in d]
    assert lvl1_dirs, "lvl1 partition level flattened away"
    inner = os.listdir(os.path.join(root, lvl1_dirs[0]))
    assert any(d.startswith("lvl2=") for d in inner), "lvl2 level flattened away"
    assert sorted(tuple(r) for r in wh.read("mart", "deep").collect()) == before


def test_compact_table_schema_evolved_column_not_misread_as_partition(
    spark, tmp_path
):
    """ADVICE r8: partition discovery compared the reader's columns to
    ONE sampled data file — on a schema-evolved table (merged schemas)
    a data column absent from that file would be misclassified as a
    partition column and the rewrite would silently change the layout.
    Discovery now also requires a hive-style ``col=`` directory segment.
    Write an old-schema batch, append a new-schema batch with an extra
    DATA column, and assert compaction keeps ``extra`` a data column
    while the real partition level survives."""
    import os

    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.sources.maintenance import compact_table
    from duckdb_dbt_finance_warehouse_spark.sources.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    old = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("pk")
    )
    wh.write(old, "mart", "evolved", partition_by=["pk"])
    new = spark.range(100, 200).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("pk"),
        (F.col("id") * 10).alias("extra"),
    )
    new.write.mode("append").partitionBy("pk").option("mergeSchema", "true").parquet(
        wh.path("mart", "evolved")
    )
    read = wh.spark.read.option("mergeSchema", "true").parquet(
        wh.path("mart", "evolved")
    )
    before = sorted(
        (r["id"], r["pk"], r["extra"]) for r in read.collect()
    )
    # monkey the warehouse read to merge schemas like an evolved reader
    wh.read = lambda s, t: wh.spark.read.option("mergeSchema", "true").parquet(  # type: ignore[method-assign]
        wh.path(s, t)
    )
    compact_table(wh, "mart", "evolved", target_files=1)
    root = wh.path("mart", "evolved")
    assert any(d.startswith("pk=") for d in os.listdir(root)), "pk level lost"
    assert not any(
        "extra=" in d for d, _, _ in os.walk(root)
    ), "data column 'extra' became a partition level"
    after = wh.spark.read.parquet(root)
    assert "extra" in after.columns
    got = sorted((r["id"], r["pk"], r["extra"]) for r in after.collect())
    assert got == before


def test_pq_adc_topk_empty_probe_panel_degrades_to_empty_result(spark):
    """ADVICE r8: an upstream filter matching nothing must yield an
    empty frame with the serving schema, not a hard failure — scheduled
    jobs degrade gracefully."""
    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.operators import pq
    from duckdb_dbt_finance_warehouse_spark.sources.tables import load_testdata

    emb = load_testdata(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    model = pq.pq_seed_codebooks(emb, n_subspaces=4, seed_mod=32)
    codes = pq.pq_encode(emb, model, n_subspaces=4)
    out = pq.pq_adc_topk(
        codes, emb.filter(F.col("vec_id") < 0), model, k=5, n_subspaces=4
    )
    assert out.columns == ["query_id", "cand_id", "adist", "rank"]
    assert out.count() == 0


def test_compact_table_drops_epoch_bookkeeping_partitions(spark, tmp_path):
    """Closing the incremental-index lifecycle: an ANN index that
    accreted per-epoch partitions from the streaming appender compacts
    with drop_partitions=["_epoch"] into a centroid_id-only layout —
    epoch dirs gone, centroid pruning intact, and probe results over
    the compacted index bit-identical to before (and to a full
    rebuild). Dropping a non-partition column must refuse."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from duckdb_dbt_finance_warehouse_spark.operators import similarity
    from duckdb_dbt_finance_warehouse_spark.sources.maintenance import compact_table
    from duckdb_dbt_finance_warehouse_spark.sources.tables import (
        Warehouse,
        load_testdata,
    )

    emb = load_testdata(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    probes = emb.filter(F.col("vec_id") % 25 == 0)
    model = similarity._ivf_model(emb, "vec_id", "embedding", 16, None, "test_compact")
    wh = Warehouse(spark, str(tmp_path))
    # simulate base + two streamed epochs
    for epoch, m in ((-1, 0), (0, 1), (1, 2)):
        batch = emb.filter(F.col("vec_id") % 3 == m)
        wh.write(
            similarity.ivf_build_lists(batch, model).withColumn(
                "_epoch", F.lit(epoch)
            ),
            "index", "ivf", mode="append", partition_by=["_epoch", "centroid_id"],
        )
    def serve():
        lists = wh.read("index", "ivf").select("centroid_id", "cand_id", "_vec")
        return sorted(
            map(
                tuple,
                similarity.ivf_probe_lists_topk(
                    lists, probes, model, k=5, n_probes=2
                ).collect(),
            )
        )

    before = serve()
    with pytest.raises(ValueError, match="not partition columns"):
        compact_table(wh, "index", "ivf", drop_partitions=["cand_id"])
    compact_table(wh, "index", "ivf", target_files=1, drop_partitions=["_epoch"])
    top = os.listdir(wh.path("index", "ivf"))
    assert not any(d.startswith("_epoch=") for d in top)
    assert any(d.startswith("centroid_id=") for d in top)
    assert "_epoch" not in wh.read("index", "ivf").columns
    assert serve() == before and len(before) > 0
