"""Skew tooling: salted agg/join equality, sketch hot keys, approx distinct."""

from pyspark.sql import functions as F

from nlp_cube_spark.operators import salting as SA


def _skewed(spark):
    # key 7 is hot (600 rows), keys 0..59 have 10 rows each
    hot = spark.range(600).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    cold = spark.range(600).select((F.col("id") % 60).alias("k"), (F.col("id") + 10000).alias("v"))
    return hot.unionByName(cold)


def test_salted_agg_count_equals_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r["count"] for r in SA.salted_agg_count(df, "k", n_salt=8).collect()}
    assert plain == salted


def test_with_salt_is_rerun_stable(spark):
    df = _skewed(spark)
    a = SA.with_salt(df, "k", 8).groupBy("k", "salt").count()
    b = SA.with_salt(df.repartition(13), "k", 8).groupBy("k", "salt").count()
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_sampled_hot_keys_finds_planted_hot_key(spark):
    df = _skewed(spark)
    got = {r.k: r.est_count for r in
           SA.sampled_hot_keys(df, "k", min_count=100, sample_cols=["k", "v"], sample_mod=10).collect()}
    assert 7 in got
    assert abs(got[7] - 610) <= 0.5 * 610  # est within 50% at this sample size
    assert all(k == 7 for k in got)  # no cold key promoted


def test_approx_distinct_within_tolerance(spark):
    df = _skewed(spark)
    ap = {r.k: r.approx_distinct for r in
          SA.approx_distinct_per_key(df, "k", "v", rsd=0.02).collect()}
    ex = {r.k: r.n for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    for k, n in ex.items():
        assert abs(ap[k] - n) <= max(2, 0.1 * n), (k, ap[k], n)
