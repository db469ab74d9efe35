"""Structured Streaming ingestion: dedup-by-url, incremental triples,
restart-from-checkpoint continuation."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.streaming import ingest


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"stream_{k}_") for k in ("src", "out", "ckpt")}
    yield d
    for v in d.values():
        shutil.rmtree(v, ignore_errors=True)


def test_stream_matches_batch(spark, dirs):
    pages = pages_df(spark, 30, seed=11)
    pages.write.mode("append").parquet(dirs["src"])
    # a crawl re-fetch: duplicate urls land in a second file
    pages.limit(10).write.mode("append").parquet(dirs["src"])

    q = ingest.start_triples_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(180)

    got = spark.read.parquet(f"{dirs['out']}/triples")
    batch = A.fused_triples(pages)
    a = {(r.url, r.sent_id, r.subj, r.pred, r.obj) for r in got.collect()}
    b = {(r.url, r.sent_id, r.subj, r.pred, r.obj) for r in batch.collect()}
    assert a == b  # dedup-by-url: re-fetched pages contribute no dup triples
    assert got.count() == len(a)  # no duplicate rows either


def test_stream_resume_from_checkpoint(spark, dirs):
    p1 = pages_df(spark, 20, seed=21)
    p1.write.mode("append").parquet(dirs["src"])
    q = ingest.start_triples_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(180)
    n1 = spark.read.parquet(f"{dirs['out']}/triples").count()

    # new files arrive; restart from the same checkpoint processes ONLY them
    p2 = pages_df(spark, 35, seed=21)  # includes the first 20 urls again
    p2.where(~F.col("url").isin([r.url for r in p1.select("url").collect()])).write.mode(
        "append"
    ).parquet(dirs["src"])
    q2 = ingest.start_triples_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(180)

    got = spark.read.parquet(f"{dirs['out']}/triples")
    full = A.fused_triples(pages_df(spark, 35, seed=21))
    assert got.count() == full.count()
    urls_got = {r.url for r in got.select("url").dropDuplicates().collect()}
    urls_want = {r.url for r in full.select("url").dropDuplicates().collect()}
    assert urls_got == urls_want
