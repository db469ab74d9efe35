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
