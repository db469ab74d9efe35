"""Deterministic KG negative sampling (operators/kgtrain.corrupt_triples,
Bordes 2013 corruption protocol, filtered setting)."""

from nlp_cube_spark.operators.kgtrain import corrupt_triples

TRUTH = [("a", "likes", "b"), ("b", "likes", "c"), ("c", "sees", "a"),
         ("a", "likes", "c")]


def _triples(spark):
    return spark.createDataFrame(TRUTH, "subj string, pred string, obj string")


def test_corruption_protocol(spark):
    out = corrupt_triples(_triples(spark), k=3).collect()
    assert out
    truth = set(TRUTH)
    for r in out:
        # one side corrupted, the other kept
        if r.corrupted == "subj":
            assert r.neg_obj == r.obj and r.neg_subj != r.subj
        else:
            assert r.corrupted == "obj"
            assert r.neg_subj == r.subj and r.neg_obj != r.obj
        # filtered setting: never a true triple
        assert (r.neg_subj, r.pred, r.neg_obj) not in truth
        assert 1 <= r.sample_id <= 3
    # <= k negatives per triple (drops are the protocol, not a bug)
    from collections import Counter

    per = Counter((r.subj, r.pred, r.obj) for r in out)
    assert all(v <= 3 for v in per.values())


def test_determinism_across_partitionings(spark):
    t = _triples(spark)
    a = sorted(map(tuple, corrupt_triples(t, k=3).collect()))
    b = sorted(map(tuple, corrupt_triples(t.repartition(7), k=3).collect()))
    assert a == b


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    assert corrupt_triples(empty, k=2).count() == 0
    nulls = spark.createDataFrame(
        [(None, "p", "x"), ("x", "p", None)], "subj string, pred string, obj string"
    )
    assert corrupt_triples(nulls, k=2).count() == 0
    # single entity: every corruption is a no-op replacement -> dropped
    one = spark.createDataFrame([("x", "p", "x")], "subj string, pred string, obj string")
    assert corrupt_triples(one, k=4).count() == 0
