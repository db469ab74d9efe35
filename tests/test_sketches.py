"""Count-Min sketch: planted-fixture exactness + CM guarantees."""

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators.sketches import (
    cms_point_estimates,
    cms_term_counts,
    count_min_sketch,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a b"),
        (2, "b c"),
        (3, "a d d"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_sketch_mass_conservation(spark, docs):
    # Every sketch row receives every token exactly once: per-row cell
    # sums all equal the total token count (9 non-empty tokens).
    sk = count_min_sketch(docs, depth=3, width=4).cache()
    per_row = sk.groupBy("row").agg(F.sum("cell").alias("s")).collect()
    assert len(per_row) == 3
    assert all(r["s"] == 9 for r in per_row)
    assert sk.where((F.col("bucket") < 0) | (F.col("bucket") >= 4)).count() == 0
    sk.unpersist()


def test_point_estimates_one_sided(spark, docs):
    # est >= exact for every term (the CM guarantee), and exact when
    # the width is large enough that no collision occurs.
    out = {r["term"]: r for r in cms_term_counts(docs, depth=3, width=4).collect()}
    exact = {"a": 4, "b": 2, "c": 1, "d": 2}
    assert set(out) == set(exact)
    for t, c in exact.items():
        assert out[t]["exact_count"] == c
        assert out[t]["overestimate"] >= 0
        assert out[t]["est_count"] == c + out[t]["overestimate"]
    wide = {r["term"]: r for r in cms_term_counts(docs, depth=4, width=4096).collect()}
    assert all(r["overestimate"] == 0 for r in wide.values())


def test_unseen_term_estimates_zero_or_collision(spark, docs):
    sk = count_min_sketch(docs, depth=4, width=4096)
    q = spark.createDataFrame([("zzz-never-seen",)], ["term"])
    est = cms_point_estimates(sk, q, depth=4, width=4096).collect()
    assert len(est) == 1 and est[0]["est_count"] >= 0


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert count_min_sketch(empty).count() == 0
    assert cms_term_counts(empty).count() == 0
