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


def test_zorder_key_matches_python_interleave(spark):
    from nlp_cube_spark.io.tables import zorder_key

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1000)],
        "a long, b long",
    )
    got = {(r.a, r.b): r.z for r in df.select("a", "b", zorder_key("a", "b").alias("z")).collect()}

    def interleave(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == interleave(a % 65536, b % 65536), (a, b)


def test_zorder_layout_prunes_box_predicates(spark, tmp_path):
    import os
    from pyspark.sql import functions as F
    from nlp_cube_spark.io.tables import write_zordered

    # 40k points on a 200x200 grid, uniformly hash-scattered
    df = spark.range(40000).select(
        (F.xxhash64("id") % 200 + 200) % 200,
        ((F.xxhash64("id", F.lit(1)) % 200) + 200) % 200,
    ).toDF("x", "y")
    zpath, hpath = str(tmp_path / "zord"), str(tmp_path / "hash")
    write_zordered(df, zpath, "x", "y", bits=8, n_files=16)
    df.repartition(16).write.mode("overwrite").parquet(hpath)

    def files_overlapping_box(path, x1, x2, y1, y2):
        hits = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            st = spark.read.parquet(os.path.join(path, f)).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).collect()[0]
            if st[0] is not None and st[0] <= x2 and st[1] >= x1 and st[2] <= y2 and st[3] >= y1:
                hits += 1
        return hits

    # a 25x25 box = 1.6% of the plane
    zhits = files_overlapping_box(zpath, 50, 74, 100, 124)
    hhits = files_overlapping_box(hpath, 50, 74, 100, 124)
    assert hhits >= 15   # hash layout: every file spans the plane
    assert zhits <= 4    # z-order: the box lives in a few tiles
    # and the data is identical under both layouts
    a = spark.read.parquet(zpath).groupBy("x", "y").count()
    b = spark.read.parquet(hpath).groupBy("x", "y").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
