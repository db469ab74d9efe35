"""Bucketed co-located joins: no Exchange on either side."""

from nlp_cube_spark.io.tables import bucketed_join, join_is_shuffle_free, write_bucketed


def test_bucketed_join_is_shuffle_free(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey"
        )
        j = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        assert join_is_shuffle_free(spark, j), "bucketed SMJ must not shuffle"
        # same join on raw parquet DOES shuffle (the thing bucketing removes)
        raw = orders.join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        assert not join_is_shuffle_free(spark, raw)
        # and the result is correct
        assert j.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_partitions(spark, tmp_path):
    """Many per-batch appended files -> one file per bucket (at test sizes),
    same rows, partition layout preserved."""
    from pyspark.sql import functions as F

    from nlp_cube_spark.io.tables import compact_partitions

    out = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket")
    )
    # simulate a streaming sink: 5 appends => >= 20 files
    for i in range(5):
        df.where(F.col("id") % 5 == i).repartition(3).write.partitionBy("bucket").mode(
            "append"
        ).parquet(out)
    before = {tuple(r) for r in spark.read.parquet(out).collect()}
    stats = compact_partitions(spark, out, "bucket", target_mb=128, sort_col="id")
    after = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert after == before
    assert stats["files_before"] >= 20
    assert stats["files_after"] <= 4  # one group landed per partition


def test_compact_partitions_multicol_streaming_layout(spark, tmp_path):
    """The streaming sink writes partitionBy(batch_id, bucket); compaction
    must take ALL layout columns (ADVICE r2: compacting a subset would
    write a new shallower layout beside the old dirs -> duplicated rows)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from nlp_cube_spark.io.tables import compact_partitions

    out = str(tmp_path / "s")
    df = spark.range(1200).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("batch_id"),
        (F.col("id") % 2).cast("int").alias("bucket"),
    )
    for i in range(4):
        df.where(F.col("id") % 4 == i).repartition(3).write.partitionBy(
            "batch_id", "bucket"
        ).mode("append").parquet(out)
    before = {tuple(r) for r in spark.read.parquet(out).collect()}
    stats = compact_partitions(spark, out, ["batch_id", "bucket"], target_mb=128)
    after = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert after == before
    assert stats["files_after"] < stats["files_before"]
    # a subset of the layout columns is rejected, not silently duplicated
    with _pytest.raises(ValueError, match="partition column"):
        compact_partitions(spark, out, "nonexistent_col")
