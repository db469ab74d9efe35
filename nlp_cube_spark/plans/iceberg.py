"""Iceberg table-format materialization (SURVEY.md §2c graph materialize).

This container ships no Iceberg runtime jars, so these entry points are
the EXECUTABLE form of what PLANS.md previously documented as prose: the
DataFrameWriterV2 calls a deployment with
`--packages org.apache.iceberg:iceberg-spark-runtime-*` runs unchanged.
`iceberg_available()` gates them (and the test) cleanly.

Why Iceberg at 100 TB (vs the plain bucketed-parquet layout build_graph
uses here):
- hidden partitioning `bucket(N, subj)` — readers never need to know the
  bucketing function; partition pruning still applies;
- snapshot isolation — the resume story becomes MERGE/overwritePartitions
  against a consistent snapshot instead of directory-level dynamic
  overwrite;
- compaction/OPTIMIZE is a table service instead of
  io/tables.compact_partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def materialize_graph_iceberg(
    spark: SparkSession, triples: DataFrame, table: str, n_buckets: int = 256
) -> None:
    """Create-or-replace the graph table with hidden bucket partitioning.

    Equivalent of build_graph's repartition+partitionBy write, minus the
    manual bucket column: Iceberg derives it from subj at write AND scan."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars absent; add "
            "org.apache.iceberg:iceberg-spark-runtime and a catalog conf"
        )
    (
        triples.writeTo(table)
        .partitionedBy(F.bucket(n_buckets, F.col("subj")))
        .createOrReplace()
    )


def upsert_bucket_iceberg(spark: SparkSession, updates: DataFrame, table: str) -> None:
    """Idempotent re-processing of a work unit: replace exactly the
    partitions present in `updates` (the Iceberg form of the resume
    story's dynamic partition overwrite)."""
    if not iceberg_available(spark):
        raise NotImplementedError("Iceberg runtime jars absent")
    updates.writeTo(table).overwritePartitions()
