"""applyInPandasWithState: first-seen URL admission across micro-batches."""

import shutil
import tempfile

import pytest

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.streaming.ingest import PAGES_DDL
from nlp_cube_spark.streaming.stateful import first_seen_urls


def test_first_seen_across_batches(spark):
    src = tempfile.mkdtemp(prefix="st_src_")
    out = tempfile.mkdtemp(prefix="st_out_")
    ckpt = tempfile.mkdtemp(prefix="st_ck_")
    try:
        p = pages_df(spark, 15, seed=31)
        p.write.mode("append").parquet(src)      # batch 1: 15 urls
        p.limit(7).write.mode("append").parquet(src)  # re-fetches

        stream = (
            spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", 1)  # forces multiple micro-batches
            .parquet(src)
        )
        q = (
            first_seen_urls(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination(180)

        got = spark.read.parquet(out)
        rows = got.collect()
        urls = [r.url for r in rows]
        assert len(urls) == len(set(urls)) == 15  # each url exactly once
        assert all(r.n_seen == 1 for r in rows)

        # restart with MORE re-fetches only: state persists, nothing emitted
        p.limit(5).write.mode("append").parquet(src)
        q2 = (
            first_seen_urls(
                spark.readStream.schema(PAGES_DDL).option("maxFilesPerTrigger", 1).parquet(src)
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q2.awaitTermination(180)
        assert spark.read.parquet(out).count() == 15
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
