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
