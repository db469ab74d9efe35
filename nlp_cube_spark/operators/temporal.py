"""Temporal joins Spark lacks as built-ins: as-of and bounded range join.

Both are staples of event analytics (and of the reference's crawl-ts
page model: BASELINE input_hint `warc_ts`) that naive SQL expresses as
theta joins — a cartesian-per-key explosion at scale. Here they are
re-expressed as single-shuffle equi-join plans:

- asof_join: for each left row, the single right row with the greatest
  right_ts <= left_ts (or < when strict) for the same key. Implemented
  as tagged UNION -> one hash exchange on the key -> per-partition sort
  -> running `last(value, ignorenulls)` window. One shuffle, no join
  explosion, no per-key driver loop. (The classic merge-join formulation
  of pandas.merge_asof, distributed.)
- range_join_binned: right_ts in [left_ts + lower, left_ts + upper).
  Left rows replicate into the <= 2 time bins of width (upper - lower)
  their window can touch; right rows land in exactly ONE bin, so the
  equi-join on (key, bin) + exact residual filter produces each
  qualifying pair exactly once — no dedup pass. Shuffle keys are
  (key, bin): uniform when the timeline is, and salting composes on top
  for hot keys (operators/salting).

Skew note: a single hot key serializes its window in asof_join (same as
any per-key sort); when key frequency is Zipfian use `salted_asof_join`
below — the composition of operators/salting.with_salt with asof_join
(left side salted, right side replicated per salt bucket), result-equal
to the unsalted form (tests/test_temporal.py::test_salted_asof_join_
equals_unsalted_on_zipfian_key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _micros(col: str) -> Column:
    """Epoch micros; cast first so TIMESTAMP_NTZ parquet columns work
    (unix_micros rejects NTZ; the session-tz interpretation cancels in
    every delta/bin computed here)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward as-of join; left keeps all rows, matched value_cols arrive
    null when no right row qualifies.

    Deterministic contract: at most one right row per (key, right_ts) —
    pre-aggregate ties (e.g. max_by) before calling; duplicate stamps
    would make "the" most recent row ambiguous under any engine.
    """
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"__ts", "__tag", "__val", "__m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves internal columns {sorted(clash)}; rename inputs")
    bad = set(value_cols) & (set(left.columns) | set(keys))
    if bad:
        raise ValueError(
            f"value_cols {sorted(bad)} collide with left/key columns; "
            "alias them on the right side before joining"
        )
    # tag so that at equal timestamps right sorts before left (non-strict
    # match) or after it (strict: simultaneous right rows are invisible)
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    lcols = left.columns
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in value_cols], F.col(right_ts).alias("__rts")).alias("__val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r.schema["__val"].dataType).alias("__val"),
        *[F.col(c) for c in lcols if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__val", ignorenulls=True).over(w)
    if tolerance_sec is not None:
        age = F.col("__ts").cast("timestamp").cast("double") - matched["__rts"].cast("timestamp").cast("double")
        matched = F.when(age <= float(tolerance_sec), matched)
    out = (
        r.unionByName(l)
        .withColumn("__m", matched)
        .where(F.col("__tag") == left_tag)
    )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col("__m")[c].alias(c) for c in value_cols],
    )


def salted_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    n_salt: int = 16,
    strict: bool = False,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """asof_join for Zipfian keys: the left (probe) side is salted with a
    content-derived salt (operators/salting.with_salt — rerun-stable), the
    right side is replicated into every salt bucket, and the window
    partitions on (key, salt). A hot key's window sort splits into n_salt
    tasks instead of one; each bucket still sees ALL right rows of the
    key, so the result is row-identical to the unsalted asof_join. Cost:
    right side shuffles n_salt x — use when the right (reference) stream
    per key is much smaller than the left event stream, the usual as-of
    shape."""
    from .salting import with_salt

    l = with_salt(left, on, n_salt, col="__salt")
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return asof_join(
        l, r, [on, "__salt"], left_ts, right_ts, value_cols,
        strict=strict, tolerance_sec=tolerance_sec,
    ).drop("__salt")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
    how: str = "inner",
) -> DataFrame:
    """Pairs (left, right) with right_ts in [left_ts + lower, left_ts +
    upper), upper > lower. Columns from both sides survive (right's via
    the caller pre-selecting / renaming to avoid collisions)."""
    if not upper_sec > lower_sec:
        raise ValueError("upper_sec must exceed lower_sec")
    if "__bin" in left.columns or "__bin" in right.columns:
        raise ValueError("range_join_binned reserves internal column '__bin'; rename inputs")
    keys = [on] if isinstance(on, str) else list(on)
    w_us = int(round((upper_sec - lower_sec) * 1_000_000))
    lo_us = int(round(lower_sec * 1_000_000))
    up_us = int(round(upper_sec * 1_000_000))

    lbin0 = F.floor((_micros(left_ts) + lo_us) / F.lit(w_us))
    lbin1 = F.floor((_micros(left_ts) + up_us - 1) / F.lit(w_us))
    l = left.withColumn("__bin", F.explode(F.array_distinct(F.array(lbin0, lbin1))))
    r = right.withColumn("__bin", F.floor(_micros(right_ts) / F.lit(w_us)))
    delta = _micros(right_ts) - _micros(left_ts)
    cond = (delta >= lo_us) & (delta < up_us)
    joined = l.join(r, keys + ["__bin"], "inner").where(cond).drop("__bin")
    if how == "inner":
        return joined
    raise ValueError(f"unsupported how={how!r} (use inner; left-outer counts "
                     "compose via a separate aggregate + left join)")


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis (the classic product-analytics operator,
    public knowledge — e.g. ClickHouse windowFunnel / BigQuery funnel
    patterns; no counterpart in the reference): per user, greedily
    match each step to its EARLIEST event strictly after the previous
    matched step. Returns one row per user: `<step>_ts` per step plus
    funnel_depth = number of steps completed in order. Equal timestamps
    do NOT advance a step (strict >), so the semantics are total-order
    deterministic without a tiebreak column.

    Plan shape: one user-keyed min-agg + one user-keyed join PER STEP —
    every intermediate is user-dimension-sized, the events table is
    scanned once per step with the step's type filter pushed to the
    scan, and nothing wider than (users x steps) ever shuffles. Hot
    users cost their own event rows only (map-side partial min)."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: duplicate step names would collide as columns")
    e = events.select(
        F.col(user_col).alias("__u"), F.col(type_col).alias("__t"), F.col(ts_col).alias("__ts")
    )
    users = e.select(F.col("__u")).dropDuplicates()
    out = users
    prev = None
    for step in steps:
        cur = f"{step}_ts"
        matched = e.where(F.col("__t") == step)
        if prev is None:
            stage = matched.groupBy("__u").agg(F.min("__ts").alias(cur))
        else:
            stage = (
                matched.join(out.select("__u", prev).where(F.col(prev).isNotNull()), "__u")
                .where(F.col("__ts") > F.col(prev))
                .groupBy("__u")
                .agg(F.min("__ts").alias(cur))
            )
        # out is referenced twice per step (the next stage's prev-ts feed
        # AND the accumulating join) — checkpoint so the earlier steps'
        # aggregation chain is not re-derived per reference (CLAUDE.md
        # shared-subtree rule), and plans stay step-sized
        out = out.join(stage, "__u", "left").localCheckpoint(eager=False)
        prev = cur
    # fold forward so the DEEPEST step's when() lands outermost — it must
    # win when several step timestamps are present
    depth = F.lit(0)
    for i, step in enumerate(steps):
        depth = F.when(F.col(f"{step}_ts").isNotNull(), i + 1).otherwise(depth)
    return out.select(
        F.col("__u").alias(user_col), *[f"{s}_ts" for s in steps], depth.alias("funnel_depth")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix (the classic product-analytics
    operator, public knowledge): cohort = the Monday-truncated week of
    a user's FIRST event; age = whole weeks since the cohort week;
    n_active = users of that cohort active in that week; retention =
    n_active / cohort size, rounded 6dp. Age 0 always has retention 1.

    Returns (cohort_week DATE, age INT, n_active, n_users, retention).

    Plan shape: one user-keyed min-agg (first activity), one DISTINCT
    (user, week) hash agg (so n_active is a plain row count — no
    count-distinct expand), a user-keyed join, and a (cohort, age) agg
    joined to the cohort-size dimension. Nothing wider than distinct
    (user, week) pairs shuffles; weeks are Monday-truncated in both
    engines (Spark date_trunc == DuckDB date_trunc), so the oracle
    replays the calendar exactly."""
    wk = F.to_date(F.date_trunc("week", F.col(ts_col)))
    first = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(wk).alias("cohort_week"))
        .localCheckpoint(eager=False)  # feeds the join AND the size dim
    )
    act = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), wk.alias("__w"))
        .dropDuplicates()
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    mat = (
        act.join(first, "__u")
        .select(
            "cohort_week",
            F.expr("datediff(__w, cohort_week) div 7").cast("int").alias("age"),
        )
        .groupBy("cohort_week", "age")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return mat.join(sizes, "cohort_week").select(
        "cohort_week",
        "age",
        "n_active",
        "n_users",
        F.round(F.col("n_active") / F.col("n_users").cast("double"), 6).alias(
            "retention"
        ),
    )


def trailing_window_stats(
    events: DataFrame,
    window_sec: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window aggregates — the rolling-metrics
    staple (rate limiting, anomaly baselines): for every event, the
    count and value-sum of the SAME user's events in
    [ts - window_sec, ts], inclusive both ends (RANGE frame semantics,
    identical in Spark and DuckDB; equal-timestamp peers are all
    included). Complements the bucketed sliding windows in
    events_sliding_window with the exact per-row form.

    The frame key is whole epoch seconds via floor(millis / 1000.0) —
    FLOOR division, matching the DuckDB oracle's `epoch_ms // 1000`
    even for pre-1970 timestamps (Spark's integer `div` truncates
    toward zero and would shift negative-millis rows onto the wrong
    second; r6 ADVICE).  The double quotient is safe: |millis| < 4.5e12
    keeps the rounding error < 2.5e-4, an order under the 1e-3 gap to
    the nearest floor boundary, and exact multiples of 1000 divide
    exactly.  Sum rounded 6dp (frame-order float sum, the accepted
    class).

    Plan: ONE user-keyed exchange + per-partition sort; the running
    frame is streamed, never buffered per user beyond the window."""
    epoch = F.expr(
        f"cast(floor(unix_millis(cast({ts_col} as timestamp)) / 1000.0d) as bigint)"
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(epoch.alias("__ep"))
        .rangeBetween(-int(window_sec), 0)
    )
    return (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            id_col,
            user_col,
            ts_col,
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            F.round(F.sum(value_col).over(w), 6).alias("sum_trailing"),
        )
    )


def hourly_volume_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    baseline_hours: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Event-volume anomaly detection — the classic trailing z-score
    monitor (control-chart / 3-sigma rule, public knowledge) over
    hourly ingest counts: each hour is scored against the mean/std of
    the `baseline_hours` PRECEDING hours; |z| >= z_threshold flags a
    spike or outage. The first operator a crawl-ingest pipeline wires
    to paging.

    Returns (hour, n_events, baseline_n, baseline_mean, z, is_anomaly);
    hours with fewer than 2 baseline points or zero variance get NULL z
    (never a throw — ANSI /0 is nullif-guarded) and is_anomaly false.

    100 TB shape: one corpus hash agg to the HOUR dimension, then a
    rows-window over that dimension (thousands of rows for years of
    data — never corpus-sized). Exactness: baseline sums are exact
    integers over a FIXED row window; variance/z is one IEEE expression
    over those integers, floor-rounded 6dp.
    """
    hours = (
        events.select(F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.orderBy("hour")
        .rowsBetween(-baseline_hours, -1)
    )
    base = hours.select(
        "hour",
        "n_events",
        F.count(F.lit(1)).over(w).alias("_k"),
        F.sum("n_events").over(w).alias("_s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_k").cast("double")
    var = (
        (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_k").cast("double"))
        / F.expr("nullif(cast(_k - 1 as double), 0.0d)")
    )
    z = (F.col("n_events") - mean) / F.expr("nullif(sqrt(_var), 0.0d)")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    out = base.withColumn("_var", var).select(
        "hour",
        "n_events",
        F.coalesce(F.col("_k"), F.lit(0)).cast("bigint").alias("baseline_n"),
        r6(mean).alias("baseline_mean"),
        r6(z).alias("_zr"),
    )
    return out.select(
        "hour",
        "n_events",
        "baseline_n",
        "baseline_mean",
        F.col("_zr").alias("z"),
        F.when(
            F.col("_zr").isNotNull() & (F.abs("_zr") >= z_threshold), F.lit(True)
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
