"""As-of and binned range joins: semantics vs tiny hand oracles plus plan
shape (single shuffle, no cartesian)."""

import datetime as dt

from pyspark.sql import functions as F

import pytest

from nlp_cube_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    salted_asof_join,
)


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m, seconds=s, microseconds=us)


def _events(spark):
    rows = [
        # (event_id, user, ts, kind)
        (1, 1, _ts(0), "click"),
        (2, 1, _ts(5), "error"),
        (3, 1, _ts(5), "click"),   # simultaneous with the error
        (4, 1, _ts(9), "error"),
        (5, 2, _ts(2), "error"),   # user 2 has no click before
        (6, 2, _ts(3), "click"),
        (7, 2, _ts(70), "error"),  # far from any click
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, kind string")


def test_asof_join_backward_semantics(spark):
    ev = _events(spark)
    clicks = ev.where("kind = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    errors = ev.where("kind = 'error'")

    got = {r.event_id: r.click_id for r in
           asof_join(errors, clicks, "user_id", "ts", "ts", ["click_id"]).collect()}
    # non-strict: the simultaneous click (id 3) matches error 2
    assert got == {2: 3, 4: 3, 5: None, 7: 6}

    strict = {r.event_id: r.click_id for r in
              asof_join(errors, clicks, "user_id", "ts", "ts", ["click_id"],
                        strict=True).collect()}
    assert strict == {2: 1, 4: 3, 5: None, 7: 6}

    tol = {r.event_id: r.click_id for r in
           asof_join(errors, clicks, "user_id", "ts", "ts", ["click_id"],
                     tolerance_sec=600).collect()}
    assert tol == {2: 3, 4: 3, 5: None, 7: None}  # 67 min > tolerance


def test_asof_join_single_shuffle_no_join(spark):
    ev = _events(spark)
    clicks = ev.where("kind = 'click'").select("user_id", "ts", F.col("event_id").alias("click_id"))
    plan = asof_join(ev, clicks, "user_id", "ts", "ts", ["click_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window formulation, not a theta join
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_binned_semantics(spark):
    ev = _events(spark)
    errors = ev.where("kind = 'error'").select("event_id", "user_id", "ts")
    clicks = ev.where("kind = 'click'").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    # clicks within [ts, ts + 5 min)
    got = sorted((r.event_id, r.click_id) for r in
                 range_join_binned(errors, clicks, "user_id", "ts", "cts",
                                   0, 300).collect())
    assert got == [(2, 3), (5, 6)]
    # window straddling a bin boundary still finds the pair exactly once
    wide = sorted((r.event_id, r.click_id) for r in
                  range_join_binned(errors, clicks, "user_id", "ts", "cts",
                                    0, 241).collect())
    assert wide == [(2, 3), (5, 6)]
    # backward-looking window: click 1 sits exactly at the closed lower
    # bound of error 2 (delta = -300 s); simultaneous clicks are excluded
    # by the open upper bound
    back = sorted((r.event_id, r.click_id) for r in
                  range_join_binned(errors, clicks, "user_id", "ts", "cts",
                                    -300, 0).collect())
    assert back == [(2, 1), (4, 3)]


def test_range_join_is_equi_join_not_cartesian(spark):
    ev = _events(spark)
    clicks = ev.select("user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id"))
    plan = range_join_binned(ev, clicks, "user_id", "ts", "cts", 0, 300)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_rejects_reserved_and_colliding_columns(spark):
    ev = _events(spark)
    clicks = ev.select("user_id", "ts", F.col("event_id").alias("click_id"))
    with pytest.raises(ValueError, match="reserves internal columns"):
        asof_join(ev.withColumn("__ts", F.lit(1)), clicks,
                  "user_id", "ts", "ts", ["click_id"])
    with pytest.raises(ValueError, match="collide"):
        # value_col 'kind' already exists on the left
        asof_join(ev, clicks.withColumn("kind", F.lit("x")),
                  "user_id", "ts", "ts", ["kind"])
    with pytest.raises(ValueError, match="reserves internal column"):
        range_join_binned(ev.withColumn("__bin", F.lit(1)), clicks,
                          "user_id", "ts", "ts", 0, 300)


def test_salted_asof_join_equals_unsalted_on_zipfian_key(spark):
    """Skew composition (operators/salting.with_salt x asof_join): a
    deliberately Zipfian left stream (~80% of rows on one key) must give
    row-identical results through the salted plan that splits the hot
    key's window sort across n_salt tasks."""
    import hashlib

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    base = dt.datetime(2024, 5, 1)
    # Zipf head: key 0 takes ~4/5 of left rows
    lrows = [
        (i, 0 if h(i, "z") % 5 < 4 else 1 + h(i, "z") % 3,
         base + dt.timedelta(seconds=h(i, "lt") % 50_000))
        for i in range(400)
    ]
    rrows = {}
    for i in range(60):
        key = (h(i, "rk") % 4, base + dt.timedelta(seconds=h(i, "rt") % 50_000))
        rrows[key] = max(rrows.get(key, 0), i)
    rrows = [(k, t, v) for (k, t), v in sorted(rrows.items())]

    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, rts timestamp, rid long")

    plain = {r.lid: r.rid for r in
             asof_join(left, right, "k", "ts", "rts", ["rid"]).collect()}
    salted = {r.lid: r.rid for r in
              salted_asof_join(left, right, "k", "ts", "rts", ["rid"],
                               n_salt=8).collect()}
    assert salted == plain
    # the salted left really spreads: the hot key occupies several buckets
    from nlp_cube_spark.operators.salting import with_salt
    n_buckets = (with_salt(left.where("k = 0"), "k", 8, col="__salt")
                 .select("__salt").distinct().count())
    assert n_buckets > 1


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check against the canonical single-node implementation:
    pandas.merge_asof (backward direction) on deterministic pseudo-random
    data with duplicate-free right stamps per key."""
    import pandas as pd

    def h(i, salt):
        import hashlib
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    base = dt.datetime(2024, 3, 1)
    lrows = [(i, h(i, "k") % 5, base + dt.timedelta(seconds=h(i, "lt") % 10_000))
             for i in range(200)]
    rrows = {}
    for i in range(120):
        key = (h(i, "rk") % 5, base + dt.timedelta(seconds=h(i, "rt") % 10_000))
        rrows[key] = max(rrows.get(key, 0), i)  # unique (key, ts): max id wins
    rrows = [(k, t, v) for (k, t), v in sorted(rrows.items())]

    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, rts timestamp, rid long")
    got = {r.lid: r.rid for r in
           asof_join(left, right, "k", "ts", "rts", ["rid"]).collect()}

    lpdf = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(rrows, columns=["k", "rts", "rid"]).sort_values("rts")
    m = pd.merge_asof(lpdf, rpdf, left_on="ts", right_on="rts",
                      by="k", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in m.itertuples()}
    assert got == want


def test_funnel_ordered_greedy(spark):
    """u1 completes view->click->purchase in order; u2 clicks BEFORE its
    first view (out of order -> depth 1); u3 views only; u4 has a
    click at exactly the view ts (strict > -> not counted). The greedy
    rule picks the EARLIEST qualifying event per step."""
    from nlp_cube_spark.operators.temporal import funnel

    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "click", "2024-01-01 10:30:00"),   # later click ignored (greedy)
        (1, "purchase", "2024-01-01 11:00:00"),
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        (3, "view", "2024-01-01 08:00:00"),
        (4, "view", "2024-01-01 07:00:00"),
        (4, "click", "2024-01-01 07:00:00"),   # same instant -> no advance
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_s string").select(
        "user_id", "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out[1].funnel_depth == 3
    assert str(out[1].click_ts) == "2024-01-01 10:05:00"
    assert out[2].funnel_depth == 1 and out[2].click_ts is None
    assert out[3].funnel_depth == 1
    assert out[4].funnel_depth == 1 and out[4].click_ts is None


def test_retention_cohorts_hand_computed(spark):
    """u1,u2 start week of 2024-01-01 (Mon); u1 returns week+1, both
    gone by week+2 except u2 at week+2; u3 starts week+1. Retention:
    cohort W0 age0 = 2/2, age1 = 1/2, age2 = 1/2; cohort W1 age0 = 1/1."""
    from nlp_cube_spark.operators.temporal import retention_cohorts

    rows = [
        (1, "2024-01-02 10:00:00"),  # W0 (Mon 2024-01-01)
        (2, "2024-01-05 09:00:00"),  # W0
        (1, "2024-01-09 10:00:00"),  # W1 -> age 1 for cohort W0
        (2, "2024-01-17 10:00:00"),  # W2 -> age 2
        (3, "2024-01-10 10:00:00"),  # cohort W1
        (None, "2024-01-10 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = {(str(r.cohort_week), r.age): r for r in retention_cohorts(ev).collect()}
    assert out[("2024-01-01", 0)].n_active == 2
    assert out[("2024-01-01", 0)].retention == 1.0
    assert out[("2024-01-01", 1)].retention == 0.5
    assert out[("2024-01-01", 2)].retention == 0.5
    assert out[("2024-01-08", 0)].n_users == 1 and out[("2024-01-08", 0)].retention == 1.0
    assert len(out) == 4


def test_trailing_window_stats_inclusive_bounds(spark):
    """1-hour trailing frame: events at t0, t0+30min, t0+60min — the
    third sees ALL three (inclusive lower bound at exactly -3600s);
    an event 2h later sees only itself; equal timestamps are peers."""
    from nlp_cube_spark.operators.temporal import trailing_window_stats

    rows = [
        (1, 7, "2024-01-01 10:00:00", 1.0),
        (2, 7, "2024-01-01 10:30:00", 2.0),
        (3, 7, "2024-01-01 11:00:00", 4.0),
        (4, 7, "2024-01-01 13:00:00", 8.0),
        (5, 7, "2024-01-01 13:00:00", 16.0),  # peer of 4
        (6, 9, "2024-01-01 10:15:00", 1.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string, value double").select(
        "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = {r.event_id: r for r in trailing_window_stats(ev, 3600).collect()}
    assert (out[3].n_trailing, out[3].sum_trailing) == (3, 7.0)
    assert (out[4].n_trailing, out[4].sum_trailing) == (2, 24.0)  # peers included
    assert (out[5].n_trailing, out[5].sum_trailing) == (2, 24.0)
    assert out[6].n_trailing == 1


def test_hourly_volume_anomalies(spark):
    import datetime as dt
    import math

    from nlp_cube_spark.operators.temporal import hourly_volume_anomalies

    base = dt.datetime(2024, 3, 1)
    rows = []
    # hours 0..23: alternating 9/11 events (mean 10, nonzero variance);
    # hour 24: 100-event spike; hour 25: back to 10
    for h in range(26):
        n = 100 if h == 24 else (10 if h == 25 else (9 if h % 2 == 0 else 11))
        for i in range(n):
            rows.append((h * 1000 + i, base + dt.timedelta(hours=h, minutes=i % 60)))
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.hour.hour + (r.hour.day - 1) * 24: r
           for r in hourly_volume_anomalies(events).collect()}
    assert len(out) == 26
    assert out[0].baseline_n == 0 and out[0].z is None and not out[0].is_anomaly
    spike = out[24]
    assert spike.baseline_n == 24 and spike.is_anomaly
    # hand-computed z over the 24 alternating baseline hours
    counts = [9 if h % 2 == 0 else 11 for h in range(24)]
    m = sum(counts) / 24
    var = (sum(c * c for c in counts) - sum(counts) ** 2 / 24) / 23
    z = (100 - m) / math.sqrt(var)
    assert abs(spike.z - z) < 1e-5
    assert not out[25].is_anomaly
    # zero-variance baseline -> NULL z, no throw
    flat = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=h)) for h in range(5) for i in range(3)],
        "event_id long, ts timestamp",
    )
    fz = hourly_volume_anomalies(flat).collect()
    assert all(r.z is None for r in fz if r.baseline_n >= 2)
