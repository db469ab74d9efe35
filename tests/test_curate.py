"""Curation operators: benchmark decontamination + PII scrubbing."""

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators.curate import decontaminate, scrub_pii


def test_decontaminate_flags_shared_ngrams(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated sentence about databases"),
            (3, "prefix words then quick brown fox jumps over suffix"),
            (4, "quick brown fox"),  # shares only a 3-gram, not a 5-gram
            (5, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over a fence",)], "text string"
    )
    got = {r.doc_id: r.contaminated
           for r in decontaminate(docs, bench, n=5).collect()}
    # doc 1 and 3 share the 5-gram 'quick brown fox jumps over'
    assert got == {1: True, 2: False, 3: True, 4: False, 5: False}
    # broadcast shape: the benchmark side must hash-join broadcast
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scrub_pii_counts_and_redacts(spark):
    rows = [
        (1, "mail me at a.user+tag@sub.example.org or call +1 555-123-4567 ok"),
        (2, "two mails x@y.io and z@w.ai, no phone (12 34 too short)"),
        (3, "digits 123456789012 run"),   # bare long digit run counts as phone
        (4, "clean text only"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in scrub_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 1)
    assert got[1]["scrubbed"] == "mail me at <EMAIL> or call <PHONE> ok"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (2, 0)
    assert got[2]["scrubbed"] == "two mails <EMAIL> and <EMAIL>, no phone (12 34 too short)"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (0, 1)
    assert got[3]["scrubbed"] == "digits <PHONE> run"
    assert got[4]["scrubbed"] == "clean text only"
    assert got[5]["scrubbed"] == ""
    # emails scrub FIRST: their digit runs never double-count as phones
    one = spark.createDataFrame([(9, "user12345678@host.com")], "doc_id long, text string")
    r = scrub_pii(one).collect()[0]
    assert (r.n_emails, r.n_phones, r.scrubbed) == (1, 0, "<EMAIL>")


def test_dsir_weights_prefer_target_domain(spark):
    from nlp_cube_spark.operators.curate import dsir_weights

    # two clearly separated vocabularies; target = legal-ish docs
    legal = ["the court finds the party liable under the statute of the state"]
    chat = ["lol ok brb gonna grab food u want some too haha ok cool"]
    rows = [(i, legal[0]) for i in range(4)] + [(i + 4, chat[0]) for i in range(4)]
    rows += [(99, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame([(0, legal[0])], "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in dsir_weights(docs, target).collect()}
    # every legal doc outscores every chat doc
    legal_w = [got[i]["log_weight_per_feat"] for i in range(4)]
    chat_w = [got[i + 4]["log_weight_per_feat"] for i in range(4)]
    assert min(legal_w) > max(chat_w)
    # empty doc: zero features, NULL weights (the ppl convention)
    assert got[99]["n_features"] == 0
    assert got[99]["log_weight"] is None and got[99]["log_weight_per_feat"] is None
    # all docs come back exactly once
    assert set(got) == {0, 1, 2, 3, 4, 5, 6, 7, 99}


def test_dsir_weights_deterministic_rerun(spark):
    from nlp_cube_spark.operators.curate import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    msrc = docs.agg(F.min("source").alias("source"))
    target = docs.join(F.broadcast(msrc), "source")
    a = sorted(tuple(r) for r in dsir_weights(docs, target).collect())
    b = sorted(tuple(r) for r in dsir_weights(docs, target).collect())
    assert a == b


def test_dsir_lms_broadcast(spark):
    from nlp_cube_spark.operators.curate import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.limit(20)
    plan = dsir_weights(docs, target)._jdf.queryExecution().executedPlan().toString()
    # fixed bucket space -> LM joins are broadcast, never a sort-merge
    assert "BroadcastHashJoin" in plan


def test_doremi_upweights_high_loss_domain(spark):
    from nlp_cube_spark.operators.curate import doremi_weights

    # domain 'rare' uses low-frequency tokens -> high CE under the
    # corpus LM -> positive excess -> weight above uniform; 'common'
    # repeats the corpus-dominant token -> below uniform.
    rows = (
        [(i, "alpha alpha alpha alpha", "common") for i in range(8)]
        + [(100 + i, f"zeta{i} eta{i} theta{i}", "rare") for i in range(3)]
        + [(200, "alpha beta gamma delta", "mid")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in doremi_weights(docs, n_rounds=3).collect()}
    assert set(out) == {"common", "rare", "mid"}
    assert out["rare"].excess_ce > 0
    assert out["common"].excess_ce == 0.0  # clamped at 0
    assert out["rare"].weight > 1 / 3 > out["common"].weight
    # mixture ~sums to 1 (floor-division shortfall < n_domains ulps)
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-4
    for r in out.values():
        assert r.weight >= 1e-3 / 3 - 1e-9  # smoothing floor


def test_doremi_uniform_when_losses_equal(spark):
    from nlp_cube_spark.operators.curate import doremi_weights

    docs = spark.createDataFrame(
        [(1, "x y", "a"), (2, "x y", "b")],
        "doc_id long, text string, source string",
    )
    out = doremi_weights(docs, n_rounds=4).collect()
    ws = [r.weight for r in out]
    assert abs(ws[0] - ws[1]) < 1e-5 and all(abs(w - 0.5) < 1e-4 for w in ws)


def test_doremi_parallelism_invariant(spark):
    from nlp_cube_spark.operators.curate import doremi_weights

    rows = [
        (i, f"tok{i % 17} tok{i % 5} tok{i % 3} filler", f"d{i % 7}")
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    outs = []
    for parts in (1, 3, 17):
        outs.append(
            sorted(
                doremi_weights(docs.repartition(parts), n_rounds=5).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
