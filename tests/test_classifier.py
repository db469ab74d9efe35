"""LR quality classifier (operators/classifier): learning signal on a
separable fixture, featureless-doc handling, deterministic reruns, and
the broadcast plan shape.  The full 4-iteration trajectory replay vs
DuckDB runs in test_entry_queries (lr_quality_weights / doc_lr_scores,
both also in the second-SF float battery)."""

from pyspark.sql import functions as F

from nlp_cube_spark.operators.classifier import (
    score_quality_lr,
    train_quality_lr,
)

GOOD = "the curated encyclopedia article discusses the treaty in measured prose"
SPAM = "click here buy now cheap deals win big prizes free free free"


def _fixture(spark):
    rows = [(i, GOOD, 1) for i in range(6)] + [(i + 6, SPAM, 0) for i in range(6)]
    rows += [(99, "", 0)]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_lr_learns_separable_vocab(spark):
    docs = _fixture(spark)
    model = train_quality_lr(docs, "label", n_buckets=256, iters=6, lr=1.0)
    scored = {r.doc_id: r.score for r in score_quality_lr(docs, model, n_buckets=256).collect()}
    good = [scored[i] for i in range(6)]
    spam = [scored[i + 6] for i in range(6)]
    # fully separable vocabularies: every curated doc outscores every spam doc
    assert min(good) > max(spam)
    assert min(good) > 0.5 > max(spam)


def test_lr_featureless_doc_scores_bias(spark):
    docs = _fixture(spark)
    model = train_quality_lr(docs, "label", n_buckets=256, iters=2, lr=1.0)
    got = {r.doc_id: r.asDict() for r in score_quality_lr(docs, model, n_buckets=256).collect()}
    assert got[99]["n_features"] == 0
    bias = {r.bucket: r.weight for r in model.collect()}[-1]
    import math

    want = math.floor(1.0 / (1.0 + math.exp(-bias)) * 1e6 + 0.5) / 1e6
    assert got[99]["score"] == want


def test_lr_deterministic_rerun(spark):
    docs = _fixture(spark)
    a = sorted(tuple(r) for r in train_quality_lr(docs, "label", n_buckets=256, iters=3).collect())
    b = sorted(tuple(r) for r in train_quality_lr(docs, "label", n_buckets=256, iters=3).collect())
    assert a == b


def test_lr_model_rows_are_bounded_and_biased(spark):
    docs = _fixture(spark)
    model = train_quality_lr(docs, "label", n_buckets=256, iters=1).collect()
    buckets = [r.bucket for r in model]
    assert -1 in buckets                      # bias row present
    assert len(buckets) == len(set(buckets))  # one row per bucket
    assert all(b < 256 for b in buckets)


def test_lr_scoring_joins_broadcast(spark):
    docs = _fixture(spark)
    model = train_quality_lr(docs, "label", n_buckets=256, iters=1)
    plan = (
        score_quality_lr(docs, model, n_buckets=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the fixed-bucket weight table must broadcast, never sort-merge
    assert "BroadcastHashJoin" in plan


def test_score_without_bias_row_defaults_to_zero(spark):
    """A model missing its bucket=-1 bias row must degrade to bias 0 —
    NOT silently unscore the corpus via an empty crossJoin."""
    from nlp_cube_spark.operators.classifier import score_quality_lr, train_quality_lr

    docs = spark.createDataFrame(
        [(1, "aa bb", 1), (2, "cc dd", 0)], "doc_id long, text string, label int"
    )
    model = train_quality_lr(docs, "label", n_buckets=64, iters=1)
    pruned = model.where("bucket >= 0")  # bias row dropped
    rows = score_quality_lr(docs, pruned, n_buckets=64).collect()
    assert len(rows) == 2 and all(r.score is not None for r in rows)


def test_calibration_bins_planted(spark):
    from nlp_cube_spark.operators.classifier import calibration_bins

    rows = [
        (1, 0.05, 0), (2, 0.08, 0), (3, 0.12, 0), (4, 0.95, 1),
        (5, 0.98, 1), (6, 0.91, 0), (7, 0.55, 1), (8, 0.52, 0),
        (9, 1.0, 1),   # score exactly 1.0 must clamp into the top bin
        (10, None, 1),  # NULL score excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    out = {r.bin: r for r in calibration_bins(df).collect()}
    assert set(out) == {0, 1, 5, 9}
    assert out[0].n_docs == 2 and out[0].n_pos == 0 and out[0].pos_rate == 0.0
    assert out[1].n_docs == 1
    assert out[5].n_docs == 2 and out[5].n_pos == 1 and out[5].pos_rate == 0.5
    assert out[9].n_docs == 4 and out[9].n_pos == 3
    assert abs(out[9].mean_score - (950000 + 980000 + 910000 + 1000000) // 4 / 1e6) < 1e-12
    assert sum(r.n_docs for r in out.values()) == 9
