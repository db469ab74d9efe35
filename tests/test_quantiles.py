"""Two-pass exact grouped quantiles: value parity with Spark's exact
`percentile` (the per-group-buffer plan it replaces) and plan shape (no
Percentile aggregate; bounded window over distinct values)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators.quantiles import grouped_quantiles

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def _h(i, salt):
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)


def _df(spark):
    # groups of very different sizes, heavy duplicate values, plus a
    # singleton group and a two-row group (interpolation edge cases)
    rows = [(f"g{_h(i, 'g') % 4}", _h(i, 'v') % 37) for i in range(500)]
    rows += [("solo", 42), ("pair", 10), ("pair", 20)]
    return spark.createDataFrame(rows, "grp string, val int")


def test_matches_exact_percentile(spark):
    df = _df(spark)
    qd = grouped_quantiles(df, ["grp"], "val", QS)
    got = {(r.grp, r.q): (round(r.value, 9), r.n) for r in qd.collect()}

    exact = df.groupBy("grp").agg(
        *[F.expr(f"percentile(val, {q})").alias(f"q{i}") for i, q in enumerate(QS)],
        F.count(F.lit(1)).alias("n"),
    )
    want = {}
    for r in exact.collect():
        for i, q in enumerate(QS):
            want[(r.grp, q)] = (round(r[f"q{i}"], 9), r.n)
    assert got == want


def test_rejects_out_of_range_quantile(spark):
    with pytest.raises(ValueError):
        grouped_quantiles(_df(spark), ["grp"], "val", [0.5, 1.5])
    with pytest.raises(ValueError, match="reserves"):
        grouped_quantiles(_df(spark).withColumnRenamed("grp", "q"), ["q"], "val", [0.5])


def test_null_values_excluded_like_exact_percentile(spark):
    """NULLs must neither occupy ranks nor count in n (code-review r5):
    percentile([NULL, 10, 20], 0.5) = 15, not 10."""
    df = spark.createDataFrame(
        [("g", None), ("g", 10), ("g", 20), ("h", None)],
        "grp string, val int",
    )
    rows = grouped_quantiles(df, ["grp"], "val", [0.5]).collect()
    got = {(r.grp, r.q): (r.value, r.n) for r in rows}
    assert got == {("g", 0.5): (15.0, 2)}  # all-NULL group h emits nothing
    want = df.where("grp = 'g'").selectExpr("percentile(val, 0.5) p").collect()[0].p
    assert got[("g", 0.5)][0] == want


def test_plan_has_no_percentile_buffer(spark):
    """The point of the operator: the optimized plan must not contain the
    Percentile aggregate (per-group full-value buffer); it is hash
    aggregates + a window over distinct values."""
    qd = grouped_quantiles(_df(spark), ["grp"], "val", [0.5, 0.9])
    plan = qd._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile" not in plan.lower()
    exec_plan = qd._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in exec_plan and "Window" in exec_plan


def test_approx_exact_at_grid_positions(spark):
    """With accuracy >= n the GK sketch holds every value, so quantiles
    at integral ranks return exactly the exact answer; shape matches
    grouped_quantiles (long format, per-group n)."""
    from nlp_cube_spark.operators.quantiles import (
        grouped_quantiles,
        grouped_quantiles_approx,
    )

    rows = [("g", float(v)) for v in range(101)] + [("h", 5.0), ("h", 7.0), ("h", 9.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    qs = [0.0, 0.5, 1.0]
    ap = {
        (r.grp, r.q): (r.approx, r.n)
        for r in grouped_quantiles_approx(df, ["grp"], "v", qs, accuracy=10000).collect()
    }
    ex = {
        (r.grp, r.q): (r.value, r.n)
        for r in grouped_quantiles(df, ["grp"], "v", qs).collect()
    }
    assert ap == ex
    assert ap[("g", 0.5)] == (50.0, 101)


def test_approx_rank_guarantee_at_low_accuracy(spark):
    """At accuracy << n the sketch compresses; the returned value must be
    an actual data value whose rank is within n/accuracy of the target."""
    from nlp_cube_spark.operators.quantiles import grouped_quantiles_approx

    n, acc = 5000, 50
    df = spark.createDataFrame([("g", float(v)) for v in range(n)], "grp string, v double")
    for r in grouped_quantiles_approx(df, ["grp"], "v", [0.25, 0.75], accuracy=acc).collect():
        assert r.approx == int(r.approx)  # an actual element, not interpolated
        assert abs(r.approx - r.q * (n - 1)) <= n / acc + 1  # values ARE ranks here
        assert r.n == n


def test_approx_null_and_reserved_handling(spark):
    from nlp_cube_spark.operators.quantiles import grouped_quantiles_approx

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("allnull", None)], "grp string, v double"
    )
    rows = grouped_quantiles_approx(df, ["grp"], "v", [0.5]).collect()
    assert len(rows) == 1 and rows[0].grp == "g" and rows[0].n == 1  # NULLs excluded
    with pytest.raises(ValueError):
        grouped_quantiles_approx(df.withColumnRenamed("grp", "q"), ["q"], "v", [0.5])
    with pytest.raises(ValueError):
        grouped_quantiles_approx(df, ["grp"], "v", [1.5])
    with pytest.raises(ValueError):
        grouped_quantiles_approx(df, ["grp"], "v", [0.5], accuracy=0)


def test_equi_width_histogram_hand_computed(spark):
    """Values 0..99, 10 bins over global [0,99]: width 9.9, value 99
    lands in the LAST bin (closed top); per-group histograms share the
    global edges; NULLs dropped; min==max collapses to one bin."""
    from nlp_cube_spark.operators.quantiles import equi_width_histogram

    rows = [(i, float(i), "a" if i < 50 else "b") for i in range(100)]
    rows.append((900, None, "a"))
    df = spark.createDataFrame(rows, "id long, v double, g string")
    h = {(r.g, r.bin): r for r in equi_width_histogram(df, "v", 10, ["g"]).collect()}
    assert sum(r.n for r in h.values()) == 100
    assert h[("b", 9)].n >= 1 and h[("b", 9)].hi == 99.0
    # group 'a' holds 0..49 -> occupies bins 0..5 only (49/9.9 = 4.94 -> bin 4? 49/9.9=4.949->4)
    assert max(b for (g, b) in h if g == "a") == 4
    flat = equi_width_histogram(spark.createDataFrame([(1, 7.0)], "id long, v double"), "v", 5)
    r = flat.collect()[0]
    assert (r.bin, r.lo, r.hi, r.n) == (0, 7.0, 7.0, 1)


def test_histogram_reserved_column_clash_raises(spark):
    import pytest as _pytest

    from nlp_cube_spark.operators.quantiles import equi_width_histogram

    df = spark.createDataFrame([(1, 2.0, "g")], "id long, v double, bin string")
    with _pytest.raises(ValueError):
        equi_width_histogram(df, "v", 4, ["bin"])
    df2 = spark.createDataFrame([(1, 2.0, 3.0)], "id long, v double, __lo double")
    with _pytest.raises(ValueError):
        equi_width_histogram(df2, "v", 4)


def test_numeric_profile_hand_computed(spark):
    """Two columns in one scan: hand-checked stats, NULLs counted but
    excluded from the moments, all-NULL column yields NULL stats."""
    from nlp_cube_spark.operators.quantiles import numeric_profile

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None), (None, None)],
        "a double, b double",
    )
    out = {r.column: r for r in numeric_profile(df, ["a", "b"]).collect()}
    assert (out["a"].n_rows, out["a"].n_null) == (4, 1)
    assert (out["a"].min, out["a"].max, out["a"].mean) == (1.0, 3.0, 2.0)
    assert out["a"].stddev == 1.0  # sample stddev of 1,2,3
    assert out["b"].n_null == 4 and out["b"].mean is None and out["b"].stddev is None


def test_correlation_matrix_hand_computed(spark):
    """y = 2x is perfectly correlated (+1), z = -x anti-correlated (-1),
    a constant column yields NULL; all pairs emitted once."""
    from nlp_cube_spark.operators.quantiles import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0), (3.0, 6.0, -3.0, 5.0)],
        "x double, y double, z double, c double",
    )
    out = {(r.col_a, r.col_b): r.corr for r in correlation_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert len(out) == 6
    assert out[("x", "y")] == 1.0 and out[("x", "z")] == -1.0
    assert out[("x", "c")] is None
