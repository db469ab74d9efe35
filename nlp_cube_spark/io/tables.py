"""Bucketed table layout: co-located joins without a shuffle.

SURVEY.md §2d: "bucketing for co-located joins". At 100 TB the words and
triples tables are repeatedly joined on url-derived keys; writing both
`bucketBy(N, key)` means the sort-merge join needs NO Exchange on either
side. This module owns the saveAsTable plumbing (bucketBy only works
through the catalog) and a guard that proves the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
