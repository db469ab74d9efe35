"""Bucketed table layout: co-located joins without a shuffle.

SURVEY.md §2d: "bucketing for co-located joins". At 100 TB the words and
triples tables are repeatedly joined on url-derived keys; writing both
`bucketBy(N, key)` means the sort-merge join needs NO Exchange on either
side. This module owns the saveAsTable plumbing (bucketBy only works
through the catalog) and a guard that proves the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16, sort_col: str | None = None
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on)


def join_is_shuffle_free(spark: SparkSession, df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return "Exchange" not in plan


def compact_partitions(
    spark: SparkSession, path: str, partition_col: str | list[str] = "bucket",
    target_mb: int = 128, sort_col: str | None = None,
) -> dict:
    """Small-file compaction for a partitioned parquet directory.

    The streaming sink appends a file per (micro-batch x bucket); on object
    storage at 100 TB the resulting file census dominates scan planning
    time. This rewrites each partition into ceil(bytes/target_mb) files
    via repartition on the partition column(s) (one task per output
    partition group), preserving the partition layout with dynamic
    overwrite — rerunnable, and readers see either the old or the new
    complete partition. `sort_col` additionally sorts rows within files so
    parquet min/max page stats become selective (data-skipping, the
    non-catalog half of what a Z-order/table-format OPTIMIZE buys).

    `partition_col` must list ALL the directory's partition columns IN
    LAYOUT ORDER — the streaming sink (streaming/ingest.py) writes
    partitionBy('batch_id', 'bucket'), so compact it with
    partition_col=['batch_id', 'bucket']; compacting a subset would write a
    new shallower layout next to the old dirs (duplicated rows on read).
    The source stream MUST be stopped first: files appended between this
    function's file listing and the overwrite commit would be silently
    dropped from the compacted layout.

    Returns {'files_before': n, 'files_after': m}."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)

    def census() -> tuple[int, int]:
        n = total = 0
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if name.endswith(".parquet"):
                n += 1
                total += f.getLen()
        return n, total

    part_cols = [partition_col] if isinstance(partition_col, str) else list(partition_col)
    files_before, total_bytes = census()
    df = spark.read.parquet(path)
    missing = [c for c in part_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"partition column(s) {missing} not in {path} — pass ALL the "
            f"layout's partition columns (found: {df.columns})"
        )
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.repartition(n_out, *part_cols)
    if sort_col:
        out = out.sortWithinPartitions(*part_cols, sort_col)
    out.write.partitionBy(*part_cols).mode("overwrite").parquet(path)
    files_after, _ = census()
    return {"files_before": files_before, "files_after": files_after}


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton/Z-order interleaved key of two non-negative integer
    columns (the Databricks/Delta OPTIMIZE ZORDER technique, public
    knowledge — bit interleaving preserves 2-D locality in a 1-D sort
    order): bit i of each input lands at output bits 2i / 2i+1.

    Inputs are reduced to `bits` low bits via pmod — a true mask even
    for NEGATIVE inputs (pmod(x, 2^bits) is x's low-bit two's-complement
    value; plain % would keep the sign and corrupt the interleave).
    Callers quantize/rank wider domains first — rank-then-interleave is
    the standard recipe. Pure shift/mask expressions: codegen'd,
    engine-portable, exact.
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a = F.pmod(a.cast("bigint"), F.lit(1 << bits))
    b = F.pmod(b.cast("bigint"), F.lit(1 << bits))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write parquet clustered by the Z-order key of (col_a, col_b):
    repartitionByRange on the key + within-partition sort, so every
    file covers a compact 2-D tile and min/max footer stats prune
    multi-column box predicates — the layout half of 'filter pushdown
    at 100 TB' that partitionBy can't give for two continuous keys.
    """
    keyed = df.withColumn("_z", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
