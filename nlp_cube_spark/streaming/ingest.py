"""Incremental crawl ingestion with Structured Streaming.

The reference is batch-only (SURVEY.md §2d "Streaming"); this is the
incremental extension a crawl pipeline needs:

    readStream(pages parquet dir)
      -> withWatermark(warc_ts)           late-data bound
      -> dropDuplicates(url)              at-most-once per url within the
                                          watermark horizon (crawl re-fetches)
      -> foreachBatch:                    fused annotate+triples kernel per
                                          micro-batch, appended to the graph
                                          table partitioned by url bucket

foreachBatch is the right sink here because the per-batch work is the same
deterministic batch pipeline. Exactly-once is checkpoint + IDEMPOTENT
REPLAY: output is partitioned by (batch_id, bucket) and each batch writes
with dynamic-partition OVERWRITE of its own batch_id partitions — if the
job dies between the write and the checkpoint commit, the replayed batch
overwrites its partial output instead of duplicating it (plain
mode('append') would double the batch). A custom stateful operator
(applyInPandasWithState) is not needed — no cross-batch NLP state exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import annotate as A
from ..plans.pipeline import with_bucket

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, src_dir: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
        .withWatermark("warc_ts", "1 hour")
        .dropDuplicates(["url"])
    )


def start_triples_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
    available_now: bool = True,
):
    """Stream pages -> triples parquet. Returns the StreamingQuery."""
    stream = read_pages_stream(spark, src_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Empty micro-batches happen routinely (idle triggers, the
        # state-flush batch availableNow appends after the data batches).
        # A partitioned overwrite of an EMPTY DataFrame carries no
        # partition values, so "dynamic" degenerates to static semantics
        # and WIPES THE WHOLE TABLE (observed on Spark 4.1: the flush
        # batch deleted every file the data batch had just written).
        if batch_df.isEmpty():
            return
        # foreachBatch hands us a MICRO-BATCH-SCOPED session clone: conf
        # set on the outer session may not reach this batch's writes (it
        # reached them only by clone-inheritance timing — flaky). Without
        # dynamic mode on the RIGHT session, a replayed batch would
        # static-overwrite every other batch's partitions.
        batch_df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        triples = A.fused_triples(batch_df)
        out = with_bucket(triples, n_buckets).withColumn("batch_id", F.lit(batch_id))
        # dynamic overwrite touches ONLY this batch_id's partitions ->
        # micro-batch replay after a crash is idempotent, not duplicating
        out.repartition("bucket").write.partitionBy("batch_id", "bucket").mode(
            "overwrite"
        ).parquet(f"{out_dir}/triples")

    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
