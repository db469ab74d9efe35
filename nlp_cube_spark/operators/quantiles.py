"""Scale-safe exact grouped quantiles: two aggregation passes, no
per-group full-value buffer.

Spark's exact `percentile` materializes every value of a group inside a
single aggregation buffer — with a handful of giant groups (per-language
quantiles over web text: ~2 hot languages x 10^10 docs) that is a
straggler/OOM at 100 TB.  `approx_percentile` is the sketch answer; this
module provides the *exact* answer with a bounded plan:

1. pass 1 — `groupBy(group, value).count()`: reduces the data to
   (group, DISTINCT value) frequencies.  For discrete-ish measures
   (char/token lengths, scores on a grid) distinct cardinality is tiny
   compared to row count, and the hash agg is map-side-combined.
2. pass 2 — a window over the *distinct values* of each group computes
   cumulative counts (per-partition state = one running sum; the sort is
   over distinct values, not rows), then each requested quantile q maps
   to the type-7 fractional rank pos = q*(n-1) and is answered by two
   conditional `min`s (the values covering ranks floor(pos) and
   floor(pos)+1) + linear interpolation — the same definition as Spark's
   exact `percentile` and DuckDB's `quantile_cont`, so results are
   hash-oracle-able, not just error-bounded.

Largest single task is O(distinct values of the hottest group), never
O(rows of the hottest group).  If the measure is continuous with ~no
duplicate values, distinct ~= rows — flip to `grouped_quantiles_approx`
below (percentile_approx: a mergeable Greenwald-Khanna sketch, state
O(accuracy) per group regardless of rows); this module's exact form is
for grid-valued measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grouped_quantiles(
    df: DataFrame, group_cols: list[str], value_col: str, qs: list[float]
) -> DataFrame:
    """Exact interpolated quantiles of `value_col` per group.

    Returns long format: group_cols + (q double, value double, n long),
    one row per (group, q).  n is the group's NON-NULL value count (NULLs
    are excluded like Spark's percentile / DuckDB's quantile_cont); a
    group whose values are all NULL produces no output rows (the exact
    aggregate would instead emit a NULL-valued row for it).
    """
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must lie in [0, 1]: {qs}")
    reserved = {"q", "value", "n", "__v", "__c", "__cum", "__n", "__klo", "__frac"}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(f"grouped_quantiles reserves column names {sorted(clash)}; rename inputs")
    # NULL values are EXCLUDED, matching Spark percentile / DuckDB
    # quantile_cont (a NULL must neither occupy a rank nor count in n)
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).cast("double").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = counts.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )
    # each (group, __v) row covers 0-indexed ranks [__cum-__c, __cum-1];
    # the value at rank k is therefore min(__v) among rows with __cum > k.
    pos = F.col("q") * (F.col("__n") - 1).cast("double")
    k_lo = F.floor(pos)
    frac = pos - k_lo.cast("double")
    long = ranked.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).withColumn("__klo", k_lo).withColumn("__frac", frac)
    v_lo = F.min(F.when(F.col("__cum") > F.col("__klo"), F.col("__v")))
    v_hi = F.min(F.when(F.col("__cum") > F.col("__klo") + 1, F.col("__v")))
    fr = F.first("__frac")
    return long.groupBy(*group_cols, "q").agg(
        # coalesce: at pos == n-1 the upper neighbour does not exist and
        # frac == 0, but 0 * NULL would still null the result
        (v_lo + fr * (F.coalesce(v_hi, v_lo) - v_lo)).alias("value"),
        F.first("__n").alias("n"),
    )


def grouped_quantiles_approx(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch quantiles: the scale path for CONTINUOUS measures where
    distinct ~= rows and the exact two-pass form loses its bound.

    One `percentile_approx` aggregation (Spark's Greenwald-Khanna
    summary: mergeable across partitions, O(accuracy) state per group —
    no per-group value buffer, no distinct-value window). The GK
    guarantee is a RANK error: the returned value's rank is within
    n/accuracy of q*n. That is the contract callers should verify —
    |approx - exact| in value space is unbounded on heavy-tailed data,
    but exact_quantile(q - eps) <= approx <= exact_quantile(q + eps)
    with eps = 2/accuracy always holds (2x slack absorbs the
    floor/interpolation difference between rank-space and the type-7
    definition). The driver query `doc_length_quantiles_approx` asserts
    exactly that envelope against the exact two-pass values, so the
    DuckDB oracle replays the check as literal booleans.

    Returns long format: group_cols + (q double, approx double, n long),
    matching grouped_quantiles' shape (NULL values excluded, all-NULL
    groups emit nothing)."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must lie in [0, 1]: {qs}")
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1: {accuracy}")
    reserved = {"q", "approx", "n", "__qs", "__vals"}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(
            f"grouped_quantiles_approx reserves column names {sorted(clash)}; rename inputs"
        )
    qlits = F.array(*[F.lit(float(q)) for q in qs])
    agg = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.percentile_approx(
                F.col(value_col).cast("double"), qlits, F.lit(accuracy)
            ).alias("__vals"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    pairs = F.arrays_zip(qlits.alias("q"), F.col("__vals").alias("approx"))
    return agg.select(
        *group_cols,
        F.explode(pairs).alias("__p"),
        "n",
    ).select(*group_cols, F.col("__p.q").alias("q"), F.col("__p.approx").alias("approx"), "n")


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column, optionally per group —
    the basic distribution profiler next to the exact/approx quantiles
    above. Bin edges come from the GLOBAL min/max (one 1-row broadcast),
    so per-group histograms share comparable bins; the max value lands
    in the last bin (half-open bins, closed top). Returns (group_cols...,
    bin, lo, hi, n) for non-empty bins; NULL values are dropped.

    bin = least(floor((x - min) / width), n_bins - 1) — pure double
    arithmetic replayed exactly by the oracle. Degenerate case
    min == max: every value goes to bin 0 with lo == hi == min.

    Plan: one scalar agg + one hash agg on (groups, bin) — uniform keys
    (a hot group spreads across its bins), nothing else shuffles."""
    if n_bins < 1:
        raise ValueError("equi_width_histogram: n_bins must be >= 1")
    groups = list(group_cols or [])
    # group cols collide with output names; __lo/__hi anywhere collide with
    # the broadcast bounds inside the crossJoin (the grouped_quantiles
    # reserved-name contract)
    clash = ({"bin", "lo", "hi", "n", "__lo", "__hi"} & set(groups)) | (
        {"__lo", "__hi"} & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"equi_width_histogram reserves column names {sorted(clash)}; rename inputs"
        )
    x = F.col(value_col).cast("double")
    bounds = df.where(x.isNotNull()).agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("__lo")) / width), F.lit(n_bins - 1)
        )
    ).cast("bigint")
    return (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(*groups, bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__lo"),
            F.first("__hi").alias("__hi"),
        )
        .select(
            *groups,
            "bin",
            F.round(
                F.col("__lo")
                + F.col("bin") * (F.col("__hi") - F.col("__lo")) / n_bins,
                6,
            ).alias("lo"),
            F.round(
                F.col("__lo")
                + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / n_bins,
                6,
            ).alias("hi"),
            "n",
        )
    )


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format numeric column profile — the data-profiling staple
    (n, nulls, min/max, mean, sample stddev per column), computed in
    ONE corpus scan: a single aggregate row holding every column's
    statistics, exploded into (column, ...) rows driver-side-free.

    Floats rounded 6dp (stddev implementations differ across engines —
    Welford vs naive — by ulps; the accepted rounding class). All-NULL
    columns profile as NULL min/max/mean/stddev, not a throw."""
    if not cols:
        raise ValueError("numeric_profile: cols must be non-empty")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"__{c}_n"),
            F.sum(F.when(x.isNull(), 1).otherwise(0)).alias(f"__{c}_nn"),
            F.round(F.min(x), 6).alias(f"__{c}_min"),
            F.round(F.max(x), 6).alias(f"__{c}_max"),
            F.round(F.avg(x), 6).alias(f"__{c}_avg"),
            F.round(F.stddev_samp(x), 6).alias(f"__{c}_sd"),
        ]
    prof = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__{c}_n").alias("n_rows"),
                F.col(f"__{c}_nn").alias("n_null"),
                F.col(f"__{c}_min").alias("min"),
                F.col(f"__{c}_max").alias("max"),
                F.col(f"__{c}_avg").alias("mean"),
                F.col(f"__{c}_sd").alias("stddev"),
            )
            for c in cols
        ]
    )
    return prof.select(F.explode(rows).alias("p")).select("p.*")


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE corpus
    scan (the profiler's companion): long format (col_a, col_b, corr)
    for every unordered pair, corr rounded 6dp. Rows where either side
    is NULL are excluded per pair; constant columns yield NULL via the
    nullif'd denominator — NOT Spark's built-in F.corr, whose internal
    covariance/variance division THROWS under ANSI mode on zero
    variance (CLAUDE.md's /0 rule); the sufficient-statistics closed
    form (the zipf_fit device) is also what the DuckDB oracle replays
    verbatim."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix: need at least 2 columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        m = x.isNotNull() & y.isNotNull()
        xm = F.when(m, x)
        ym = F.when(m, y)
        n = F.sum(F.when(m, 1).otherwise(0)).cast("double")
        num = n * F.sum(xm * ym) - F.sum(xm) * F.sum(ym)
        dx = n * F.sum(xm * xm) - F.sum(xm) * F.sum(xm)
        dy = n * F.sum(ym * ym) - F.sum(ym) * F.sum(ym)
        aggs.append(
            F.round(
                num / F.sqrt(F.nullif(dx, F.lit(0.0)) * F.nullif(dy, F.lit(0.0))), 6
            ).alias(f"__{a}__{b}")
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__{a}__{b}").alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
