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


def test_sessionize_streaming_matches_batch(spark):
    """session_window is the SAME operator batch and streaming: the
    streamed (watermarked, append-mode) result is a subset of the batch
    result (windows still open at end-of-stream are withheld by the
    watermark), and every emitted session matches the batch one exactly."""
    from pyspark.sql import functions as F

    from nlp_cube_spark.operators.sessions import sessionize

    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ck_")
    try:
        # sf parquet carries TIMESTAMP_NTZ; event-time watermarks need
        # TIMESTAMP (session tz is pinned UTC, so the cast is value-stable)
        events = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        events.write.mode("append").parquet(src)
        batch = {
            tuple(r)
            for r in sessionize(events, gap="30 minutes").collect()
        }

        stream = spark.readStream.schema(events.schema).parquet(src).withWatermark("ts", "1 hour")
        q = (
            sessionize(stream, gap="30 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_mem")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = {tuple(r) for r in spark.sql("SELECT * FROM sess_mem").collect()}
        assert emitted  # watermark passed most of the 2024 event range
        assert emitted <= batch
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_sessionize_matches_bruteforce(spark):
    """session_window semantics == the gaps-and-islands model on seeded
    random event streams. Boundary is INCLUSIVE: an event at exactly
    last_event + gap merges (verified against Spark; the 1799/1800/1801
    deltas below pin all three cases)."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from nlp_cube_spark.operators.sessions import sessionize

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(6):
        t = 0
        for _ in range(rng.randint(5, 40)):
            t += rng.choice([60, 300, 900, 1799, 1800, 1801, 7200])
            rows.append((u, base + dt.timedelta(seconds=t), round(rng.random() * 10, 2)))
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")

    got = {
        (r.user_id, r.session_start, r.n_events, r.sum_value)
        for r in sessionize(events, gap="30 minutes").collect()
    }

    want = set()
    by_user = {}
    for u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, v))
    for u, evs in by_user.items():
        evs.sort()
        cur = [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if (nxt[0] - cur[-1][0]).total_seconds() <= 1800:
                cur.append(nxt)
            else:
                want.add((u, cur[0][0], len(cur), round(sum(x[1] for x in cur), 2)))
                cur = [nxt]
        want.add((u, cur[0][0], len(cur), round(sum(x[1] for x in cur), 2)))
    assert got == want


def test_watermark_drops_late_events_from_finalized_windows(spark):
    """The 'watermarks + windowed aggs for late data' contract, pinned:
    an event arriving after its tumbling window was EVICTED (append-mode
    emission happens at the end of the batch whose in-effect watermark
    passed the window end; a late row in THAT same batch still merges —
    verified while building this test) must be dropped: the finalized
    count is immutable and no duplicate window row is emitted."""
    import datetime as dt
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ck_")
    try:
        t0 = dt.datetime(2024, 1, 1)

        def df(rows):
            return spark.createDataFrame(rows, "user_id long, ts timestamp")

        # batch 1: three events in hour 0, then events out to hour 4 so
        # the 1h watermark finalizes windows ending <= t0+3h
        batch1 = [(1, t0 + dt.timedelta(minutes=m)) for m in (5, 10, 20)] + [
            (1, t0 + dt.timedelta(hours=h)) for h in (1, 2, 3, 4)
        ]
        df(batch1).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.2)  # distinct mtime: FileStreamSource batches in order
        # batch 2: watermark 3h now IN EFFECT -> hour-0 window emitted
        # and evicted at this batch's end
        df([(1, t0 + dt.timedelta(hours=5))]).coalesce(1).write.mode(
            "append").parquet(src)
        _time.sleep(1.2)
        # batch 3: one LATE event inside the long-evicted hour-0 window
        # + a fresh event
        df([(1, t0 + dt.timedelta(minutes=30)),
            (1, t0 + dt.timedelta(hours=6))]).coalesce(1).write.mode(
            "append").parquet(src)

        stream = (
            spark.readStream.schema(df(batch1).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        q = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .count()
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("late_mem")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT w.start AS s, count FROM late_mem ORDER BY s"
        ).collect()
        by_start = {}
        for r in rows:
            assert r.s not in by_start, "duplicate emission for a window"
            by_start[r.s] = r["count"]
        # hour-0 window: the 3 on-time events only — the late 00:30
        # event was dropped, not merged and not re-emitted
        assert by_start[t0] == 3
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
